"""Follow-up probes for the slow full-resolution decoder tail.

bench_up5.py showed every conv formulation at the up5 shapes stuck around
~100-200 GB/s effective bandwidth and <=50% MXU regardless of channel
width. These probes separate the hypotheses:

  mm_wide   - the wide up-conv's exact matmul (554k x 576) @ (576 x 512):
              if this is fast, XLA's conv lowering (not the MXU shape) is
              the bottleneck and a Pallas im2col kernel will win.
  mm_1b     - conv1b's matmul (2.22M x 576) @ (576 x 64).
  relu_bw   - pure elementwise pass over the full-res map: achievable HBM
              bandwidth at this tensor shape/layout.
  conv128   - conv1b zero-padded to Cin=Cout=128 (2x FLOPs): does filling
              the lane dim change anything?
  wide_f32  - the wide conv in f32 (different tiling (8,128) vs (16,128)).

Run: python tools/bench_up5b.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def chain_ms(fn, x, params, n=10):
    """Marginal two-length chain (utils/profiling.marginal_chain), same
    methodology as bench_up5.py so the two tools' numbers are comparable
    (the old single-chain variant here included ~RTT/n fixed overhead)."""
    from cspn_monodepth_tpu.utils.profiling import marginal_chain

    def step_fn(c, p):
        y = fn(c, p)
        return c + jnp.mean(y).astype(c.dtype) * 1e-9

    step, _ = marginal_chain(step_fn, x, params, n=n)
    return round(step * 1e3, 3)


def main():
    b = 32
    bf = jnp.bfloat16
    key = jax.random.key(0)

    res = {}

    # wide conv equivalent matmul: M=32*114*152, K=9*64, N=512
    m1 = 32 * 114 * 152
    a1 = jax.random.uniform(key, (m1, 576), bf)
    w1 = jax.random.normal(key, (576, 512), bf) * 0.05
    res["mm_wide_ms"] = chain_ms(
        lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.bfloat16),
        a1, w1)
    res["mm_wide_ideal_ms"] = round(m1 * 576 * 512 * 2 / 197e12 * 1e3, 3)

    # conv1b equivalent matmul: M=32*228*304, K=576, N=64
    m2 = 32 * 228 * 304
    a2 = jax.random.uniform(key, (m2, 576), bf)
    w2 = jax.random.normal(key, (576, 64), bf) * 0.05
    res["mm_1b_ms"] = chain_ms(
        lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.bfloat16),
        a2, w2)
    res["mm_1b_ideal_ms"] = round(m2 * 576 * 64 * 2 / 197e12 * 1e3, 3)

    # elementwise bandwidth probe at the full-res map
    x228 = jax.random.uniform(key, (b, 228, 304, 64), bf)
    res["relu_ms"] = chain_ms(
        lambda x, _: jnp.maximum(x, 0) * jnp.bfloat16(1.0001), x228, ())
    res["relu_gbps"] = round(
        2 * x228.size * 2 / (res["relu_ms"] / 1e3) / 1e9, 1)

    # conv1b padded to 128 channels in and out
    x128 = jax.random.uniform(key, (b, 228, 304, 128), bf)
    k128 = jax.random.normal(key, (3, 3, 128, 128), bf) * 0.05
    res["conv128_ms"] = chain_ms(
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), padding=((1, 1), (1, 1)), dimension_numbers=DN),
        x128, k128)

    # wide conv in f32
    x114 = jax.random.uniform(key, (b, 114, 152, 64), jnp.float32)
    kw = jax.random.normal(key, (3, 3, 64, 512), jnp.float32) * 0.05
    res["wide_f32_ms"] = chain_ms(
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), padding=((1, 1), (1, 1)), dimension_numbers=DN),
        x114, kw)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
