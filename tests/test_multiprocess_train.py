"""Two-process end-to-end training-loop test.

``tests/test_distributed_init.py`` proves the process group and one
collective work; this goes the last layer: a full (tiny, synthetic)
``train_modelnet`` epoch across 2 real processes sharing one workdir, with
metrics that agree with a single-process run over the same 4 global
devices.  This is the multi-host analog of the reference's per-step
``dist.all_gather`` of preds/labels (train_modelnet.py:375-377): the loop
must never touch non-process-addressable shards directly
(parallel.mesh.fetch / shard_batch handle it).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "synthetic_data=true",
    "train.dataloader.selected_points=128",
    "feature_learning_block.downsample.M=[64,32]",
    "feature_learning_block.downsample.K=8",
    "feature_learning_block.embedding.K=[8,8]",
    "feature_learning_block.attention.K=[8,8,8]",
    "train.epochs=1",
    "train.validation_freq=1",
    # 4 global devices x 16 = global batch 64 → a 4-step epoch: few enough
    # optimizer updates that cross-topology reduction-order noise (amplified
    # chaotically by the stochastic Gumbel bin sampler) stays bounded
    "train.dataloader.batch_size_per_gpu=16",
    "test.dataloader.batch_size_per_gpu=16",
    "train.ddp.random_seed=7",
]

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["SAMBLE_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ["SMOKE_LOCAL_DEVICES"]))
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from samble_tpu.cli.train_modelnet import main

argv = os.environ["SMOKE_ARGV"].split("\x1f")
result = main(argv)
print(f"WORKER_BEST {os.environ.get('SMOKE_RANK', '0')} {result['best_acc']:.6f}",
      flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(rank, local_devices, argv):
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(
        {
            "SAMBLE_REPO": REPO,
            "SMOKE_RANK": str(rank),
            "SMOKE_LOCAL_DEVICES": str(local_devices),
            "SMOKE_ARGV": "\x1f".join(argv),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "",
        }
    )
    return env


def _epoch_metrics(workdir):
    recs = [
        json.loads(l)
        for l in open(os.path.join(workdir, "metrics.jsonl"))
        if l.strip()
    ]
    return [r for r in recs if "train/loss" in r]


def _best_line(out, rank):
    for line in out.splitlines():
        if line.startswith(f"WORKER_BEST {rank} "):
            return float(line.split()[-1])
    raise AssertionError(f"no WORKER_BEST line for rank {rank}:\n{out}")


def test_two_process_train_epoch(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    shared_workdir = str(tmp_path / "run_mp")

    ddp = [
        "train.ddp.multi_host=true",
        "train.ddp.master_addr=127.0.0.1",
        f"train.ddp.master_port={port}",
        "train.ddp.world_size=2",
    ]
    procs = []
    for rank in range(2):
        argv = [f"workdir={shared_workdir}", *TINY, *ddp,
                f"train.ddp.rank={rank}"]
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=_env(rank, 2, argv), cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    # both ranks computed the same global metrics
    best0 = _best_line(outs[0], 0)
    best1 = _best_line(outs[1], 1)
    assert abs(best0 - best1) < 1e-6, (best0, best1)

    mp_metrics = _epoch_metrics(shared_workdir)
    assert len(mp_metrics) == 1  # one epoch, logged once (rank 0 only)
    assert "val/acc" in mp_metrics[0]

    # ---- single-process run, same 4 global devices, same seed ----
    sp_workdir = str(tmp_path / "run_sp")
    argv = [f"workdir={sp_workdir}", *TINY]
    p = subprocess.run(
        [sys.executable, str(worker)],
        env=_env(0, 4, argv), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=900,
    )
    assert p.returncode == 0, f"single-process run failed:\n{p.stdout[-4000:]}"
    sp_metrics = _epoch_metrics(sp_workdir)
    assert len(sp_metrics) == 1

    # same data order, same global batch, same partitioning → metrics agree
    # up to cross-process collective reduction-order noise, which the
    # stochastic bin sampler amplifies a little over the 4 updates
    mp, sp = mp_metrics[0], sp_metrics[0]
    assert abs(mp["train/loss"] - sp["train/loss"]) < 0.05, (mp, sp)
    assert abs(mp["val/loss"] - sp["val/loss"]) < 0.05, (mp, sp)
    assert abs(mp["train/acc"] - sp["train/acc"]) < 0.1, (mp, sp)
    assert abs(mp["val/acc"] - sp["val/acc"]) < 0.1, (mp, sp)
