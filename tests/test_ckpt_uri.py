"""Checkpoint-URI resolution + reference-torch-checkpoint eval path.

Covers the reference's checkpoint-distribution surface
(test_modelnet.py:37-49 fetches checkpoints from wandb artifacts) with the
framework's ``ckpt=`` URI scheme: file://, archive extraction, and direct
evaluation of a reference ``checkpoint.pt`` through the test CLI.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

from samble_tpu.cli.common import normalize_ckpt_dir, resolve_ckpt_uri

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "train.dataloader.selected_points=128",
    "feature_learning_block.downsample.M=[64,32]",
    "feature_learning_block.downsample.K=8",
    "feature_learning_block.embedding.K=[8,8]",
    "feature_learning_block.attention.K=[8,8,8]",
    "test.dataloader.batch_size_per_gpu=4",
]


def test_plain_path_passthrough(tmp_path):
    p = str(tmp_path / "ckpt")
    assert resolve_ckpt_uri(p) == p


def test_file_uri(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    assert resolve_ckpt_uri(f"file://{d}") == str(d)


def test_file_uri_zip_extraction(tmp_path):
    # a zip holding one top-level run directory unwraps to that directory
    run = tmp_path / "myrun"
    (run / "checkpoints").mkdir(parents=True)
    (run / "checkpoints" / "marker").write_text("x")  # zips skip empty dirs
    (run / "run_config.json").write_text("{}")
    archive = tmp_path / "bundle.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        for base, _, files in os.walk(run):
            for f in files:
                full = os.path.join(base, f)
                zf.write(full, os.path.relpath(full, tmp_path))
    out = resolve_ckpt_uri(f"file://{archive}")
    assert os.path.isdir(out) and out.endswith("myrun")
    assert os.path.isfile(os.path.join(out, "run_config.json"))
    # repeated resolution reuses the extraction
    assert resolve_ckpt_uri(f"file://{archive}") == out
    assert normalize_ckpt_dir(out).endswith("checkpoints")


def test_torch_checkpoint_eval_cli(tmp_path):
    """A reference-format torch checkpoint.pt evaluates through the test CLI
    (weights converted by samble_tpu.interop, bin boundaries grafted)."""
    torch = pytest.importorskip("torch")
    sys.path.append("/root/reference")
    from models import cls_model as ref_cls_model

    from samble_tpu.config import load_config

    def cfg_for_torch():
        return load_config(
            os.path.join(REPO, "configs", "default.yaml"),
            os.path.join(REPO, "configs", "datasets", "modelnet.yaml"),
            os.path.join(REPO, "configs", "cls.yaml"),
            TINY + ["feature_learning_block.attention.asm=[dot,dot,dot]"],
        )

    torch.manual_seed(0)
    tmod = ref_cls_model.ModelNetModel(cfg_for_torch())
    inner = np.asarray([1.0, 0.5, 0.0, -0.5, -1.0], np.float32)
    pair = [
        torch.tensor(np.r_[np.inf, inner].reshape(1, 1, 1, 6)),
        torch.tensor(np.r_[inner, -np.inf].reshape(1, 1, 1, 6)),
    ]
    ckpt = tmp_path / "checkpoint.pt"
    torch.save(
        {
            "model_state_dict": {
                f"module.{k}": v for k, v in tmod.state_dict().items()
            },
            "bin_boundaries": [pair, pair],
        },
        str(ckpt),
    )

    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            "JAX_PLATFORM_NAME": "cpu",
            "JAX_COMPILATION_CACHE_DIR": "/root/.cache/jax_test_cache",
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.3",
        }
    )
    proc = subprocess.run(
        [
            sys.executable, "-m", "samble_tpu.cli.test_modelnet",
            f"ckpt=file://{ckpt}", "synthetic_data=true",
            f"workdir={tmp_path / 'evalrun'}", *TINY,
        ],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"eval CLI failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    assert "acc" in proc.stdout.lower()
