from cspn_monodepth_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from cspn_monodepth_tpu.parallel.halo import cspn_propagate_spatial

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "cspn_propagate_spatial",
]
