"""CI wrapper for the Pallas-on/off equivalence gate (tools/pallas_parity_gate).

Runs on TPU only (the suite's conftest pins the in-process backend to CPU,
so the gate runs in a subprocess with the box's native TPU platform).  Both
committed checkpoints are gated at the decision level: the cls run asserts
identical accuracy + a bounded per-cloud prediction-flip rate, the seg run
mIoU within 2e-3 + bounded per-point flips — i.e. the packed-key kNN
quantization (kernels/keys.py) never reaches the models' decisions.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_HAS_TPU = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def _tpu_env():
    env = dict(os.environ)
    # undo anything the CPU-pinned test session exported; the subprocess
    # must see the box's native (TPU) platform
    env.pop("JAX_NUM_CPU_DEVICES", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.cache/jax_tpu_cache"
    return env


@pytest.mark.skipif(not _HAS_TPU, reason="needs the TPU backend")
@pytest.mark.parametrize("run_dir", ["runs/r4_cls_1024", "runs/r4_seg_2048"])
def test_pallas_parity_gate(run_dir):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pallas_parity_gate.py"),
         run_dir],
        env=_tpu_env(), cwd=REPO, capture_output=True, text=True, timeout=2700,
    )
    assert proc.returncode == 0, (
        f"parity gate failed for {run_dir}:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
    assert "PARITY GATE: PASS" in proc.stdout
