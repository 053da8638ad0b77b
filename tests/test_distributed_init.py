"""Two-process ``jax.distributed`` smoke test for parallel.maybe_init_distributed.

The 8-virtual-device tests elsewhere are single-process; this covers the
multi-host path's flag parsing, coordinator wiring, and init order
(reference parity: MASTER_ADDR/PORT rendezvous + world_size knobs,
train_modelnet.py:162-166, configs/default.yaml:95-100) by launching two
real CPU-backend processes against a localhost coordinator and running one
cross-process collective.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["SAMBLE_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from samble_tpu.config.loader import Config
from samble_tpu.parallel import maybe_init_distributed, make_mesh, shard_batch

rank = int(os.environ["SMOKE_RANK"])
cfg = Config({
    "train": {"ddp": {
        "multi_host": True,
        "master_addr": "127.0.0.1",
        "master_port": int(os.environ["SMOKE_PORT"]),
        "world_size": 2,
        "rank": rank,
    }}
})
assert maybe_init_distributed(cfg), "maybe_init_distributed returned False"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == rank, (jax.process_index(), rank)
assert jax.device_count() == 4, jax.device_count()   # 2 procs x 2 cpu devs
assert len(jax.local_devices()) == 2

# one real cross-process collective through the mesh the framework builds
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    np.full((2, 4), float(rank + 1), np.float32),
    (4, 4),
)

@jax.jit
def total(x):
    return jnp.sum(x)

t = float(total(arr))
assert abs(t - (1.0 * 8 + 2.0 * 8)) < 1e-6, t
print(f"OK rank={rank} total={t}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env_base = {
        **os.environ,
        "SAMBLE_REPO": repo,
        "SMOKE_PORT": str(port),
        # the subprocesses must not inherit the outer test process's
        # platform plugin or device-count flags
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "",
    }
    procs = []
    for rank in range(2):
        env = dict(env_base, SMOKE_RANK=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    for rank, out in enumerate(outs):
        assert f"OK rank={rank} total=24.0" in out, out
