"""Component-wise TPU timing breakdown (encoder / decoder / CSPN / full).

Uses the same serial-chaining methodology as bench.py (see its docstring:
the tunneled PJRT transport acks dispatches asynchronously, so each
component is timed as N serially-dependent evaluations inside one jit,
closed by a scalar readback).

Usage: python tools/profile_components.py [--batch 32] [--hw 228x304]
       [--iters 10] [--train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, init_carry, n, params=None):
    """MARGINAL time of one application of carry -> carry.

    Delegates to the canonical utils/profiling.marginal_chain (two serial
    chains of n and 5n differenced; non-positive differences are retried
    with more repetitions and then raised, never clamped).

    params (a pytree) is passed as a jit ARGUMENT, not a closure constant —
    closed-over weights are embedded in the HLO proto, which the tunnel's
    remote-compile endpoint rejects above ~100 MB (HTTP 413).
    """
    from cspn_monodepth_tpu.utils.profiling import marginal_chain

    step, _dispatch = marginal_chain(fn, init_carry, params, n=n)
    return step


def main():
    import jax
    import jax.numpy as jnp

    from cspn_monodepth_tpu.models import CSPNDepthNet
    from cspn_monodepth_tpu.models.resnet import ResNetEncoder
    from cspn_monodepth_tpu.models.unet import UpProjDecoder
    from cspn_monodepth_tpu.ops.cspn import cspn_propagate

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", default="228x304")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--num-iters", type=int, default=24)
    ap.add_argument("--train", action="store_true",
                    help="also time fwd+bwd for each component")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))
    b = args.batch

    key = jax.random.key(0)
    x = jax.random.uniform(key, (b, h, w, 4), jnp.float32)

    # Probe the same variants the flagship model runs (packed stem +
    # packed decoder tail — models/cspn_net.py defaults).
    enc = ResNetEncoder(packed_stem=True)
    stem_packed = enc.stem_is_packed(h, w)
    ev = enc.init(jax.random.key(1), x, train=False)
    dec = UpProjDecoder(packed_tail=True)
    skips_c = jax.jit(lambda v, xx: enc.apply(v, xx, train=False))(ev, x)
    dv = dec.init(jax.random.key(2), skips_c, out_hw=(h, w), train=False,
                  stem_packed=stem_packed)

    model = CSPNDepthNet(modality="rgbd", num_iters=args.num_iters)
    mv = model.init(jax.random.key(3), x, train=False)

    guid = jax.random.normal(jax.random.key(4), (b, h, w, 8), jnp.float32)
    blur = jax.random.uniform(jax.random.key(5), (b, h, w, 1), jnp.float32)
    sp = (blur * (jax.random.uniform(jax.random.key(6), blur.shape) < 0.01))

    res = {}

    # encoder fwd: carry x -> x (+ tiny feedback from deepest feature)
    def enc_step(xx, v):
        sk = enc.apply(v, xx, train=False)
        return xx + jnp.mean(sk[-1]).astype(xx.dtype) * 1e-9

    res["encoder_fwd_ms"] = chain_time(enc_step, x, args.iters, ev) * 1e3

    # decoder fwd: carry skips -> skips
    def dec_step(sk, v):
        f = dec.apply(v, sk, out_hw=(h, w), train=False,
                      stem_packed=stem_packed)
        bump = jnp.mean(f).astype(sk[0].dtype) * 1e-9
        return tuple(s + bump for s in sk)

    res["decoder_fwd_ms"] = chain_time(dec_step, skips_c, args.iters,
                                       dv) * 1e3

    # cspn fwd (pallas-dispatch as in the model)
    def cspn_step(d, gs):
        g, s = gs
        return cspn_propagate(g, d, s, num_iters=args.num_iters,
                              norm_type="8sum_clamp", impl="auto")

    res[f"cspn{args.num_iters}_fwd_ms"] = (
        chain_time(cspn_step, blur, args.iters, (guid, sp)) * 1e3)

    # full model fwd
    def full_step(xx, v):
        out = model.apply(v, xx, train=False)
        return xx + jnp.mean(out).astype(xx.dtype) * 1e-9

    res["full_fwd_ms"] = chain_time(full_step, x, args.iters, mv) * 1e3

    if args.train:
        # per-component fwd+bwd: grads w.r.t. params of that component only
        def enc_loss(p, xx, v):
            sk = enc.apply({**v, "params": p}, xx, train=True,
                           mutable=["batch_stats"])[0]
            return sum(jnp.mean(s.astype(jnp.float32) ** 2) for s in sk)

        def enc_train(carry, v):
            p, xx = carry
            g = jax.grad(enc_loss)(p, xx, v)
            p = jax.tree.map(lambda a, b_: a - 1e-9 * b_.astype(a.dtype),
                             p, g)
            return p, xx

        res["encoder_fwdbwd_ms"] = chain_time(
            enc_train, (ev["params"], x), args.iters, ev) * 1e3

        def dec_loss(p, sk, v):
            f = dec.apply({**v, "params": p}, sk, out_hw=(h, w), train=True,
                          stem_packed=stem_packed,
                          mutable=["batch_stats"])[0]
            return jnp.mean(f.astype(jnp.float32) ** 2)

        def dec_train(carry, v):
            p, sk = carry
            g = jax.grad(dec_loss)(p, sk, v)
            p = jax.tree.map(lambda a, b_: a - 1e-9 * b_.astype(a.dtype),
                             p, g)
            return p, sk

        res["decoder_fwdbwd_ms"] = chain_time(
            dec_train, (dv["params"], skips_c), args.iters, dv) * 1e3

        def cspn_loss(d0, gs):
            g, s = gs
            out = cspn_propagate(g, d0, s, num_iters=args.num_iters,
                                 norm_type="8sum_clamp", impl="auto")
            return jnp.mean(out ** 2)

        def cspn_train(d, gs):
            gr = jax.grad(cspn_loss)(d, gs)
            return d - 1e-9 * gr

        res[f"cspn{args.num_iters}_fwdbwd_ms"] = chain_time(
            cspn_train, blur, args.iters, (guid, sp)) * 1e3

        def loss_fn(p, xx, v):
            out, _ = model.apply({**v, "params": p}, xx, train=True,
                                 mutable=["batch_stats"])
            return jnp.mean(out ** 2)

        def train_step(carry, v):
            p, xx = carry
            g = jax.grad(loss_fn)(p, xx, v)
            p = jax.tree.map(lambda a, b_: a - 1e-9 * b_.astype(a.dtype),
                             p, g)
            return p, xx

        res["full_fwdbwd_ms"] = chain_time(
            train_step, (mv["params"], x), args.iters, mv) * 1e3

    res.update(batch=b, hw=f"{h}x{w}", backend=jax.default_backend())
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
