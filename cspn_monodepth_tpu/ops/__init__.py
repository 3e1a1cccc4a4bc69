from cspn_monodepth_tpu.ops.cspn_ref import (
    NEIGHBOR_OFFSETS,
    normalize_affinity,
    cspn_propagate_ref,
)
from cspn_monodepth_tpu.ops.cspn import cspn_propagate
from cspn_monodepth_tpu.ops.sparse import (
    stereo_sparse_sample,
    uniform_sparse_sample,
)

__all__ = [
    "NEIGHBOR_OFFSETS",
    "normalize_affinity",
    "cspn_propagate_ref",
    "cspn_propagate",
    "uniform_sparse_sample",
    "stereo_sparse_sample",
]
