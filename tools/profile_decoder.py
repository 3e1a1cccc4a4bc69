"""Per-block decoder timing on TPU (serial-chained, honest over the
tunneled transport — see bench.py docstring).

Times each UpProj block of the NYU-shape decoder in isolation (fwd and
fwd+bwd) plus its analytic bf16-peak matmul time, to locate utilization
gaps block by block.

Usage: python tools/profile_decoder.py [--batch 32] [--train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_components import chain_time  # noqa: E402  (same methodology)

PEAK_BF16_TFLOPS = 197.0  # v5e


def block_flops(cin, ch, cs, in_hw, out_hw):
    """fwd FLOPs per image for one UpProjBlock (sub-pixel up-convs)."""
    ih, iw = in_hw
    oh, ow = out_hw
    up = ih * iw * 9 * cin * (8 * ch) * 2          # 3x3 -> 2 branches x4 parity
    skip = oh * ow * 25 * cs * (2 * ch) * 2 if cs else 0
    conv1b = oh * ow * 9 * ch * ch * 2
    return up + skip + conv1b


def main():
    import jax
    import jax.numpy as jnp

    from cspn_monodepth_tpu.models.unet import UpProjBlock

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--packed", action="store_true",
                    help="time PackedUpProjBlock for the sub-128-channel "
                         "exact-2x blocks (up4/up5) instead of the naive "
                         "full-res block — the round-3 packed decoder tail")
    args = ap.parse_args()
    b = args.batch

    # (name, cin, ch, skip_ch, in_hw, out_hw) for NYU 228x304 / ResNet-50
    blocks = [
        ("up1", 1024, 512, 1024, (8, 10), (15, 19)),
        ("up2", 512, 256, 512, (15, 19), (29, 38)),
        ("up3", 256, 128, 256, (29, 38), (57, 76)),
        ("up4", 128, 64, 64, (57, 76), (114, 152)),
        ("up5", 64, 64, 0, (114, 152), (228, 304)),
    ]

    from cspn_monodepth_tpu.models.unet import PackedUpProjBlock

    res = {}
    for name, cin, ch, cs, in_hw, out_hw in blocks:
        # The packed variant applies where the round-3 decoder uses it:
        # sub-128-channel blocks with exact-2x geometry (models/unet.py
        # UpProjDecoder._pack_block) — up4 and up5 at the NYU shape.
        packed = (args.packed and ch < 128
                  and tuple(out_hw) == (2 * in_hw[0], 2 * in_hw[1]))
        blk = PackedUpProjBlock(ch) if packed else UpProjBlock(ch)
        x = jax.random.uniform(jax.random.key(0), (b, *in_hw, cin),
                               jnp.float32)
        skip = (jax.random.uniform(jax.random.key(1), (b, *out_hw, cs),
                                   jnp.float32) if cs else None)
        # The skip rides in the CARRY (with a data dependence on the
        # previous step) so its convs cannot be hoisted out of the timing
        # scan as loop-invariant code — a closed-over constant skip made
        # skip-heavy blocks look impossibly fast.
        if packed:
            v = blk.init(jax.random.key(2), x, skip=skip, train=False)

            def fwd(carry, vv, blk=blk):
                xx, sk = carry
                y = blk.apply(vv, xx, skip=sk, train=False)
                bump = jnp.mean(y).astype(xx.dtype) * 1e-9
                return (xx + bump, None if sk is None else sk + bump)
        else:
            v = blk.init(jax.random.key(2), x, skip=skip, out_hw=out_hw,
                         train=False)

            def fwd(carry, vv, blk=blk, out_hw=out_hw):
                xx, sk = carry
                y = blk.apply(vv, xx, skip=sk, out_hw=out_hw, train=False)
                bump = jnp.mean(y).astype(xx.dtype) * 1e-9
                return (xx + bump, None if sk is None else sk + bump)

        t = chain_time(fwd, (x, skip), args.iters, v)
        gf = block_flops(cin, ch, cs, in_hw, out_hw) * b / 1e9
        res[name] = {
            "packed": packed,
            "fwd_ms": round(t * 1e3, 3),
            "gflops": round(gf, 1),
            "ideal_ms": round(gf / PEAK_BF16_TFLOPS, 3),
            "mxu_util": round(gf / 1e3 / (t * PEAK_BF16_TFLOPS), 3),
        }

        if args.train:
            if packed:
                def loss(p, xx, sk, vv, blk=blk):
                    y = blk.apply({**vv, "params": p}, xx, skip=sk,
                                  train=True, mutable=["batch_stats"])[0]
                    return jnp.mean(y.astype(jnp.float32) ** 2)
            else:
                def loss(p, xx, sk, vv, blk=blk, out_hw=out_hw):
                    y = blk.apply({**vv, "params": p}, xx, skip=sk,
                                  out_hw=out_hw, train=True,
                                  mutable=["batch_stats"])[0]
                    return jnp.mean(y.astype(jnp.float32) ** 2)

            def step(carry, vv, loss=loss):
                p, xx, sk = carry
                lv, g = jax.value_and_grad(loss)(p, xx, sk, vv)
                p = jax.tree.map(
                    lambda a, b_: a - 1e-9 * b_.astype(a.dtype), p, g)
                # feed the loss back into the skip so it is not
                # loop-invariant (hoistable) across the timing scan
                if sk is not None:
                    sk = sk + lv.astype(sk.dtype) * 1e-12
                return p, xx, sk

            tb = chain_time(step, (v["params"], x, skip), args.iters, v)
            res[name]["fwdbwd_ms"] = round(tb * 1e3, 3)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
