"""Microbench: formulations of conv5x5(nearest_upsample_2x(x)) on TPU.

Variants:
  naive     — materialize the 2x map, one 5x5 conv.
  subpixel4 — 4 parity 3x3 convs + stack/transpose interleave.
  shuffle1  — ONE 3x3 conv to 4*cout channels (collapsed kernels stacked
              along cout) + depth-to-space reshape. Better MXU occupancy
              (4x wider N), one interleave transpose instead of four.
  dilated   — lhs_dilation=2 conv with the collapsed 6x6 kernel (engine-
              native input dilation; no explicit interleave).

Run: python tools/bench_upconv.py  (serial-chained timing, see bench.py)
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

from cspn_monodepth_tpu.models.unet import (
    _C0,
    _C1,
    _upsample2x,
    upconv5x5_subpixel,
)

DN = ("NHWC", "HWIO", "NHWC")


def naive(x, k, dtype=jnp.bfloat16):
    return lax.conv_general_dilated(
        _upsample2x(x).astype(dtype), k.astype(dtype), (1, 1),
        padding=((2, 2), (2, 2)), dimension_numbers=DN)


def shuffle1(x, k, dtype=jnp.bfloat16):
    b, h, w, cin = x.shape
    cout = k.shape[-1]
    ks = []
    for cy in (_C0, _C1):
        for cx in (_C0, _C1):
            ky = jnp.asarray(cy, k.dtype)
            kx = jnp.asarray(cx, k.dtype)
            ks.append(jnp.einsum("ua,vb,abio->uvio", ky, kx, k))
    kk = jnp.concatenate(ks, axis=-1)               # (3,3,cin,4*cout)
    y = lax.conv_general_dilated(
        x.astype(dtype), kk.astype(dtype), (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=DN)                       # (b,h,w,4*cout)
    y = y.reshape(b, h, w, 2, 2, cout)              # (.., py, px, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)               # (b,h,py,w,px,c)
    return y.reshape(b, 2 * h, 2 * w, cout)


def dilated(x, k, dtype=jnp.bfloat16):
    # 1D collapse: W6 = [k0, k0+k1, k1+k2, k2+k3, k3+k4, k4]
    m = jnp.zeros((6, 5), k.dtype)
    rows = [(0, (0,)), (1, (0, 1)), (2, (1, 2)), (3, (2, 3)), (4, (3, 4)),
            (5, (4,))]
    for r, cols in rows:
        for c in cols:
            m = m.at[r, c].set(1.0)
    k6 = jnp.einsum("ua,vb,abio->uvio", m, m, k)     # (6,6,cin,cout)
    return lax.conv_general_dilated(
        x.astype(dtype), k6.astype(dtype), (1, 1),
        padding=((3, 3), (3, 3)), lhs_dilation=(2, 2),
        dimension_numbers=DN)


def chain_ms(fn, x, k, n=20):
    @jax.jit
    def chained(x, k):
        def body(c, _):
            y = fn(c, k)
            # serial dependence via a scalar feedback
            c = c + jnp.mean(y).astype(c.dtype) * 1e-9
            return c, None
        c, _ = lax.scan(body, x, None, length=n)
        return c

    out = chained(x, k)
    _ = float(jnp.sum(out[..., :1]))
    t0 = time.perf_counter()
    out = chained(x, k)
    _ = float(jnp.sum(out[..., :1]))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    res = {}
    key = jax.random.key(0)
    shapes = [
        ("up5", (32, 114, 152, 64), 64),
        ("up4", (32, 57, 76, 192), 64),
        ("up2", (32, 15, 19, 1024), 256),
    ]
    for name, xshape, cout in shapes:
        x = jax.random.uniform(key, xshape, jnp.float32)
        k = jax.random.normal(key, (5, 5, xshape[-1], cout), jnp.float32)
        # correctness cross-check. TPU "f32" convs run at bf16 input
        # precision by default, so tolerance is relative to the field
        # magnitude (tight-f32 equivalence is asserted in the CPU test
        # suite: tests/test_model.py::test_upconv_subpixel_equivalence).
        want = naive(x, k, jnp.float32)
        scale = float(jnp.max(jnp.abs(want)))
        for label, fn in [("subpixel4", upconv5x5_subpixel),
                          ("shuffle1", shuffle1), ("dilated", dilated)]:
            got = fn(x, k, jnp.float32)
            err = float(jnp.max(jnp.abs(got - want))) / scale
            assert err < 3e-2, (name, label, err)
        for label, fn in [("naive", naive),
                          ("subpixel4", upconv5x5_subpixel),
                          ("shuffle1", shuffle1), ("dilated", dilated)]:
            res[f"{name}_{label}_ms"] = round(chain_ms(fn, x, k), 3)
            print(f"{name}_{label}_ms: {res[f'{name}_{label}_ms']}",
                  flush=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
