"""Hardware calibration: achievable HBM bandwidth and MXU peak on this
chip, measured with the serial-chain methodology (bench.py docstring).

Motivation: bench_up5b.py showed elementwise ops over the full-res decoder
map running at ~140 GB/s effective — far below the v5e's nominal HBM
bandwidth. These probes establish the real ceilings so per-op utilization
numbers in the profiling tools mean something:

  copy64 / copy128 / copy2d - pure c = c*k streams at different layouts
    (C=64 half-lane vs C=128 full-lane vs flat 2D) -> true copy bandwidth
    and the cost of lane padding.
  mm4k - 4096^3 square bf16 matmul -> true MXU peak.
  mm_stream - matmul with a 2.55 GB streamed LHS held as a constant
    argument (carry is only the 576x64 RHS) -> streaming matmul bandwidth
    without the carry-update traffic that inflated mm_1b in bench_up5b.

Run: python tools/bench_bw.py
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


def chain_ms(fn, carry, params, n=10):
    """Marginal two-length chain (utils/profiling.marginal_chain): the old
    single-chain version here smeared the 5-25 ms tunnel dispatch latency
    as RTT/n into every step, understating the sub-ms copy-probe ceilings
    this tool exists to calibrate by 2-4x."""
    from cspn_monodepth_tpu.utils.profiling import marginal_chain

    step, _ = marginal_chain(fn, carry, params, n=n)
    return step * 1e3


def main():
    bf = jnp.bfloat16
    key = jax.random.key(0)
    res = {}

    scale = jnp.bfloat16(1.0000001)

    # copy streams: read + write the carry once per step. A bare `c*k`
    # chain gets strength-reduced by XLA (the marginal difference measures
    # ~0); rolling the leading dim each step forces a real data movement
    # that cannot collapse across iterations.
    for name, shape in [("copy64", (32, 228, 304, 64)),
                        ("copy128", (32, 228, 304, 128)),
                        ("copy2d", (32 * 228 * 304, 64))]:
        c = jax.random.uniform(key, shape, bf)
        t = chain_ms(lambda c, _: jnp.roll(c, 1, axis=0) * scale, c, ())
        gb = 2 * c.size * 2 / 1e9
        res[f"{name}_ms"] = round(t, 3)
        res[f"{name}_gbps"] = round(gb / (t / 1e3), 1)

    # square matmul: carry (4096,4096), params (4096,4096)
    a = jax.random.uniform(key, (4096, 4096), bf) * 0.01
    w = jax.random.uniform(key, (4096, 4096), bf) * 0.01
    t = chain_ms(lambda c, p: jnp.dot(c, p, preferred_element_type=bf),
                 a, w)
    res["mm4k_ms"] = round(t, 3)
    res["mm4k_tflops"] = round(2 * 4096 ** 3 / (t / 1e3) / 1e12, 1)

    # streaming matmul: big LHS is a constant param, carry is the tiny RHS
    m = 32 * 228 * 304
    big = jax.random.uniform(key, (m, 576), bf)
    rhs = jax.random.normal(key, (576, 64), bf) * 0.05

    def stream(c, p):
        out = jnp.dot(p, c, preferred_element_type=jnp.float32)
        return c * (1.0 + jnp.mean(out) * 1e-12).astype(bf)

    t = chain_ms(stream, rhs, big)
    res["mm_stream_ms"] = round(t, 3)
    res["mm_stream_gbps"] = round(big.size * 2 / (t / 1e3) / 1e9, 1)
    res["mm_stream_tflops"] = round(2 * m * 576 * 64 / (t / 1e3) / 1e12, 1)

    res["device"] = str(jax.devices()[0])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
