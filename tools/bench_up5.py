"""Microbench: where does the final (full-resolution, 64-channel) decoder
block's time go on TPU?

tools/profile_decoder.py shows up4/up5 at 25%/14% MXU utilization while
up1-up3 sit at 74-85%. This decomposes up5 (input 32x114x152x64, output
32x228x304x64) into its pieces and times each with the serial-chain
methodology (see bench.py docstring), plus candidate reformulations:

  wide      - the 3x3 conv to 4*(2*64) channels (both branches batched)
  d2s       - the depth-to-space interleave of the wide output
  bn_train  - one flax BatchNorm (train mode) on the full-res 64ch map
  conv1b    - 3x3 64->64 at full res (the N=64 half-lane suspect)
  conv1b128 - same matmul work but cout=128 (lane-fill control)
  conv1b_packed - conv1b computed in the packed (114,152,256) layout as a
              dense (3,3,256,256) conv (4x FLOPs, full lanes, no d2s)
  block     - whole UpProjBlock fwd for reference

Run: python tools/bench_up5.py [--train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def chain_ms(fn, x, params, n=10, train=False):
    """Marginal per-step ms via utils/profiling.marginal_chain (two-length
    differencing cancels the tunnel's run-varying dispatch latency in
    expectation; non-positive differences retry, then raise)."""
    from cspn_monodepth_tpu.utils.profiling import marginal_chain

    if train:
        def one(cc, pp):
            return jnp.mean(fn(cc, pp).astype(jnp.float32) ** 2)

        def step_fn(c, p):
            g = jax.grad(one)(c, p)
            return c - 1e-9 * g.astype(c.dtype)
    else:
        def step_fn(c, p):
            y = fn(c, p)
            return c + jnp.mean(y).astype(c.dtype) * 1e-9

    step, _ = marginal_chain(step_fn, x, params, n=n)
    return round(step * 1e3, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    b = args.batch
    bf = jnp.bfloat16

    key = jax.random.key(0)
    x114 = jax.random.uniform(key, (b, 114, 152, 64), bf)
    x228 = jax.random.uniform(key, (b, 228, 304, 64), bf)
    x114p = jax.random.uniform(key, (b, 114, 152, 256), bf)

    k_wide = jax.random.normal(key, (3, 3, 64, 512), bf) * 0.05
    k_1b = jax.random.normal(key, (3, 3, 64, 64), bf) * 0.05
    k_1b128 = jax.random.normal(key, (3, 3, 64, 128), bf) * 0.05
    k_pack = jax.random.normal(key, (3, 3, 256, 256), bf) * 0.05

    def conv(x, k, pad=1):
        return lax.conv_general_dilated(
            x, k, (1, 1), padding=((pad, pad), (pad, pad)),
            dimension_numbers=DN)

    def d2s(y):
        bb, h, w, c4 = y.shape
        c = c4 // 4
        y = y.reshape(bb, h, w, 2, 2, c)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(bb, 2 * h, 2 * w, c)

    import flax.linen as nn

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=bf)
    bnv = bn.init(key, x228)

    res = {}
    res["wide_ms"] = chain_ms(lambda x, k: conv(x, k), x114, k_wide,
                              train=args.train)
    res["wide_d2s_ms"] = chain_ms(lambda x, k: d2s(conv(x, k)), x114, k_wide,
                                  train=args.train)
    res["bn_train_ms"] = chain_ms(
        lambda x, v: bn.apply(v, x, mutable=["batch_stats"])[0], x228, bnv,
        train=args.train)
    res["conv1b_ms"] = chain_ms(lambda x, k: conv(x, k), x228, k_1b,
                                train=args.train)
    res["conv1b128_ms"] = chain_ms(lambda x, k: conv(x, k), x228, k_1b128,
                                   train=args.train)
    res["conv1b_packed_ms"] = chain_ms(lambda x, k: conv(x, k), x114p, k_pack,
                                       train=args.train)

    from cspn_monodepth_tpu.models.unet import UpProjBlock

    blk = UpProjBlock(64)
    bv = blk.init(jax.random.key(2), x114.astype(jnp.float32),
                  out_hw=(228, 304), train=False)

    def block_fwd(x, v):
        return blk.apply(v, x, out_hw=(228, 304), train=False)

    res["block_fwd_ms"] = chain_ms(block_fwd, x114.astype(jnp.float32), bv)
    res["train"] = args.train
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
