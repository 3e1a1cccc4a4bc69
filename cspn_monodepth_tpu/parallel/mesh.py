"""Device mesh + sharding helpers (SURVEY.md section 2.2 N1/N4/N6).

The framework uses a 2D logical mesh ("data", "spatial"):

* "data": batch dimension of every array is sharded here; gradient
  all-reduce is inserted by XLA (psum over ICI/DCN) — this replaces the
  reference's (nonexistent) DDP/NCCL layer.
* "spatial": the H dimension of feature maps / depth maps is sharded here
  for large-resolution configs (KITTI 1216x352); the CSPN stencil then
  uses shard_map halo exchange (parallel/halo.py).

Multi-host bootstrap is `jax.distributed.initialize()` + the same code —
`make_mesh` uses all global devices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cspn_monodepth_tpu.configs import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a ("data", "spatial") mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        data, spatial = len(devices), 1
    else:
        data, spatial = cfg.data, cfg.spatial
    assert data * spatial <= len(devices), (
        f"mesh {data}x{spatial} needs {data * spatial} devices, "
        f"have {len(devices)}")
    arr = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_dim: int | None = None) -> NamedSharding:
    """Sharding for (B, H, W, ...) batches: B over "data"; optionally H
    over "spatial" (spatial_dim = index of H)."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (spatial_dim + 1)
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with B sharded over "data"."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
