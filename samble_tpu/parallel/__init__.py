from samble_tpu.parallel.mesh import (
    BarrierOnFirstCall,
    make_mesh,
    maybe_init_distributed,
    shard_batch,
    fetch,
    wait_at_barrier,
    replicate_state,
    batch_sharding,
    replicated_sharding,
)

__all__ = [
    "BarrierOnFirstCall",
    "wait_at_barrier",
    "make_mesh",
    "maybe_init_distributed",
    "shard_batch",
    "fetch",
    "replicate_state",
    "batch_sharding",
    "replicated_sharding",
]
