"""Sharded serving path (BASELINE config #5): restore → mesh → batched
inference, on the 8-device virtual CPU mesh."""

import os

import jax
import numpy as np
import pytest

from samble_tpu.models import ClsModel
from samble_tpu.serve import Server
from samble_tpu.train.checkpoint import CheckpointManager
from samble_tpu.train.schedules import make_optimizer
from samble_tpu.train.state import create_train_state

from tests._tiny_configs import N, tiny_cls_config


def _tiny_full_config():
    """tiny_cls_config + the train/datasets sections Server needs."""
    cfg = tiny_cls_config()
    cfg.train = {
        "lr": 1e-3,
        "epochs": 1,
        "lr_scheduler": {"enable": False},
        "optimizer": {"which": "adamw", "weight_decay": 0.0},
        "dataloader": {
            "selected_points": N,
            "data_augmentation": {
                "enable": False, "num_aug": 0,
                "jitter": {"enable": False}, "rotate": {"enable": False},
                "translate": {"enable": False},
                "anisotropic_scale": {"enable": False},
            },
        },
    }
    cfg.datasets = {"mapping": {str(i): i for i in range(40)}}
    return cfg


def test_server_sharded_inference(tmp_path):
    assert jax.device_count() >= 8
    cfg = _tiny_full_config()
    model = ClsModel(cfg=cfg, num_classes=40, train=True)
    # same optimizer factory as Server's restore template, so the saved
    # opt_state tree matches
    tx = make_optimizer(cfg.train, steps_per_epoch=1)
    state = create_train_state(
        model, (np.zeros((8, N, 3), np.float32),), tx, jax.random.key(0)
    )
    ckpt_dir = os.path.join(str(tmp_path), "checkpoints")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(0, state)
    mgr.close()

    srv = Server(cfg, ckpt_dir, task="cls", dtype=np.float32)
    pts = np.random.default_rng(0).normal(size=(16, N, 3)).astype(np.float32)
    logits = srv(pts)
    assert logits.shape == (16, 40)
    assert np.isfinite(logits).all()
    # per-cloud results do not depend on batch co-membership / sharding
    logits2 = srv(pts[:8])
    np.testing.assert_allclose(logits[:8], logits2, rtol=2e-4, atol=2e-5)


def test_server_from_run(tmp_path):
    """from_run: config resurrection + task autodetection from a real run
    directory (regression: datasets.mapping is a Config, not a dict)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = str(tmp_path / "run")
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update({
        "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu",
        "JAX_COMPILATION_CACHE_DIR": "/root/.cache/jax_test_cache",
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.3",
    })
    proc = subprocess.run(
        [sys.executable, "-m", "samble_tpu.cli.train_modelnet",
         f"workdir={workdir}", "synthetic_data=true",
         "train.dataloader.selected_points=128",
         "feature_learning_block.downsample.M=[64,32]",
         "feature_learning_block.downsample.K=8",
         "feature_learning_block.embedding.K=[8,8]",
         "feature_learning_block.attention.K=[8,8,8]",
         "train.epochs=1", "train.validation_freq=1",
         "train.dataloader.batch_size_per_gpu=4"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    srv = Server.from_run(workdir, dtype=np.float32)
    assert srv.task == "cls"
    pts = np.random.default_rng(1).normal(size=(8, 128, 3)).astype(np.float32)
    logits = srv(pts)
    assert logits.shape == (8, 40) and np.isfinite(logits).all()

    # best-checkpoint artifact (reference train_modelnet.py:525-546 parity):
    # a self-contained run-dir-shaped directory that serves directly
    art = os.path.join(workdir, "artifacts", "best")
    manifest = json.load(open(os.path.join(art, "manifest.json")))
    assert manifest["step"] >= 0 and 0.0 <= manifest["metric"] <= 1.0
    assert os.path.isfile(os.path.join(art, "run_config.json"))
    assert os.path.isdir(
        os.path.join(art, "checkpoints", str(manifest["step"]))
    )
    # simulate a "download": the artifact must work from a moved copy too
    import shutil

    downloaded = str(tmp_path / "downloaded_artifact")
    shutil.copytree(art, downloaded)
    srv2 = Server.from_run(downloaded, dtype=np.float32)
    logits2 = srv2(pts)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))
