from samble_tpu.parallel.mesh import (
    make_mesh,
    maybe_init_distributed,
    shard_batch,
    replicate_state,
    batch_sharding,
    replicated_sharding,
)

__all__ = [
    "make_mesh",
    "maybe_init_distributed",
    "shard_batch",
    "replicate_state",
    "batch_sharding",
    "replicated_sharding",
]
