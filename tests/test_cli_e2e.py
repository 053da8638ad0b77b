"""End-to-end CLI test: train 1 epoch (synthetic, tiny shapes) → checkpoint
→ evaluate that checkpoint via the test CLI with ``ckpt=`` alone (config
resurrection from the run's saved run_config.json, reference
test_modelnet.py:51-59 parity).

Runs the real console entry points in subprocesses on a single CPU device
(fresh interpreters so the hosted-TPU plugin never registers).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "train.dataloader.selected_points=128",
    "feature_learning_block.downsample.M=[64,32]",
    "feature_learning_block.downsample.K=8",
    "feature_learning_block.embedding.K=[8,8]",
    "feature_learning_block.attention.K=[8,8,8]",
    "train.epochs=1",
    "train.validation_freq=1",
    "train.dataloader.batch_size_per_gpu=4",
    "test.dataloader.batch_size_per_gpu=4",
]


def _cli_env():
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            "JAX_PLATFORM_NAME": "cpu",
            "JAX_COMPILATION_CACHE_DIR": "/root/.cache/jax_test_cache",
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.3",
        }
    )
    return env


def _run(mod, args):
    proc = subprocess.run(
        [sys.executable, "-m", mod, *args],
        env=_cli_env(), cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"{mod} failed (rc={proc.returncode}):\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}"
    )
    return proc.stdout


def test_train_then_eval_cli(tmp_path):
    workdir = str(tmp_path / "run")
    out = _run(
        "samble_tpu.cli.train_modelnet",
        [f"workdir={workdir}", "synthetic_data=true", *TINY],
    )
    assert "best val acc:" in out
    # run artifacts
    assert os.path.isfile(os.path.join(workdir, "metrics.jsonl"))
    assert os.path.isfile(os.path.join(workdir, "run_config.json"))
    assert os.path.isdir(os.path.join(workdir, "checkpoints"))
    recs = [
        json.loads(l)
        for l in open(os.path.join(workdir, "metrics.jsonl"))
        if l.strip()
    ]
    epoch_recs = [r for r in recs if "train/loss" in r]
    assert epoch_recs and "val/acc" in epoch_recs[-1]
    assert "val/loss" in epoch_recs[-1]

    # eval with ckpt= ONLY (plus synthetic data): config must be resurrected
    # from run_config.json — no usr_config / shape overrides repeated here
    out = _run(
        "samble_tpu.cli.test_modelnet",
        [f"ckpt={workdir}", "synthetic_data=true",
         f"workdir={tmp_path / 'eval'}"],
    )
    line = next(l for l in out.splitlines() if l.startswith("{"))
    result = json.loads(line)
    assert 0.0 <= result["acc"] <= 1.0


def test_train_resume_resurrects_config(tmp_path):
    """``workdir=<run> resume=true`` must continue with the run's OWN saved
    config (run_config.json) — not the default shapes — with dotted
    overrides still applied on top."""
    workdir = str(tmp_path / "run")
    _run(
        "samble_tpu.cli.train_modelnet",
        [f"workdir={workdir}", "synthetic_data=true", *TINY],
    )
    out = _run(
        "samble_tpu.cli.train_modelnet",
        [f"workdir={workdir}", "resume=true", "synthetic_data=true",
         "train.epochs=2"],
    )
    assert "[resume] restored" in out
    cfg = json.load(open(os.path.join(workdir, "run_config.json")))
    # resurrected tiny shape, not the 2048-pt default
    assert cfg["train"]["dataloader"]["selected_points"] == 128
    assert cfg["feature_learning_block"]["downsample"]["M"] == [64, 32]
    # the override on top of the resurrected config took effect
    assert cfg["train"]["epochs"] == 2
    recs = [
        json.loads(l)
        for l in open(os.path.join(workdir, "metrics.jsonl"))
        if l.strip() and "train/loss" in l
    ]
    assert recs[-1]["epoch"] == 1  # continued into epoch 1 of 2
