from bagel_tpu.parallel.mesh import (
    AXES,
    batch_sharding,
    make_mesh,
    param_pspec,
    param_shardings,
    shard_batch,
    shard_params,
)

__all__ = [
    "AXES",
    "batch_sharding",
    "make_mesh",
    "param_pspec",
    "param_shardings",
    "shard_batch",
    "shard_params",
]
