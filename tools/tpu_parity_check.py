"""TPU-compiled pallas-vs-jnp parity check (forward + gradients).

Run after any CSPN op change (verify skill): the CPU test suite runs the
kernels in interpret mode only; this compiles them on the real chip.
bench.py also runs the same check (cspn_monodepth_tpu/ops/parity.py)
before timing and embeds the result in the recorded BENCH JSON, so a
Mosaic regression can never silently ship a wrong-gradient bench.

Pass --kitti to additionally check the H-tiled kernel + tiled adjoint at
a KITTI-class shape (slower: first compile of the tiled adjoint is
minutes on a cold cache).

See cspn_monodepth_tpu/ops/parity.py for the relative-error methodology
(expansive dynamics with random signed gates).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cspn_monodepth_tpu.ops.parity import (
    cspn_parity_check,
    prenorm_parity_check,
    vmem_routing_check,
)

assert jax.default_backend() != "cpu", jax.default_backend()
results = cspn_parity_check()
# The prenorm slab kernel + prenorm adjoint: the per-shard hot path of a
# real multi-chip run (parallel/halo.py impl="auto"), otherwise compiled
# nowhere outside this check and the bench gate. NYU-shard and
# KITTI-shard slab shapes.
results["prenorm_96x304"] = prenorm_parity_check(batch=2, h=96, w=304)
results["vmem_routing"] = vmem_routing_check()
if "--kitti" in sys.argv:
    from cspn_monodepth_tpu.ops.cspn_pallas import cspn_propagate_pallas_tiled

    results["tiled_kitti"] = cspn_parity_check(
        norms=("8sum_clamp",), batch=2, h=352, w=1216,
        op=cspn_propagate_pallas_tiled)["8sum_clamp"]
    results["prenorm_104x1216"] = prenorm_parity_check(
        batch=2, h=104, w=1216)
print(json.dumps(results, indent=1))
print("TPU parity OK")
