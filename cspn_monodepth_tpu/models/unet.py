"""UNet decoder with FCRN-style UpProj blocks (Flax linen, NHWC).

Functional equivalent of the reference's decoder (SURVEY.md R4): four
up-projection blocks with encoder skip concatenation — the upstream names
are `Gudi_UpProj_Block` / `Gudi_UpProj_Block_Cat` (Laina et al. FCRN
design): after a 2x nearest unpool, two branches (5x5 -> 3x3 conv, and a
single 5x5 conv), each BN'd, summed, ReLU'd.

TPU-first optimization — sub-pixel decomposition of the up-convolutions:
a 5x5 conv applied to a nearest-duplicated 2x-upsampled map touches only
3 distinct source pixels per axis per output, so it is EXACTLY a set of 4
parity-interleaved 3x3 convs on the un-upsampled map with collapsed
kernels (the same algebra as Laina et al.'s "faster up-convolutions",
adapted from zero-insertion to duplicate unpooling). That removes the 4x
redundancy of convolving duplicated pixels: 36 vs 100 MACs per source
pixel per (cin, cout) — ~2.8x fewer FLOPs for every up-conv. The skip
concat is handled by linearity: conv5x5([up(x), skip]) ==
fast_upconv5x5(x) + conv5x5(skip), as two separate weight tensors.
Equivalence vs the naive unpool+conv is asserted bit-tight in
tests/test_model.py::test_upconv_subpixel_equivalence.

Odd spatial sizes (228x304 is not divisible by 32) are handled by cropping
the conv output to the skip's H x W — shapes stay static under jit. (The
crop happens after the up-conv, so at odd sizes the last output row/col
sees one row of real context instead of the zero pad a crop-before-conv
ordering would give; both are valid SAME-conv semantics.)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# 1D collapse matrices: row u of C_p maps the 5 taps of a 5x5 kernel onto
# the 3 distinct source pixels seen at output parity p (duplicate unpool:
# up(x)[i] = x[i // 2], so tap offset a lands on source offset
# floor((p + a) / 2) for a in -2..2).
_C0 = ((1, 1, 0, 0, 0),
       (0, 0, 1, 1, 0),
       (0, 0, 0, 0, 1))
_C1 = ((1, 0, 0, 0, 0),
       (0, 1, 1, 0, 0),
       (0, 0, 0, 1, 1))


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, 2H, 2W, C) -> (B, H, W, 4C), channel blocks ordered (py, px) —
    the inverse of the depth-to-space in upconv5x5_subpixel_multi."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, h, 2, w, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H, W, 4C) -> (B, 2H, 2W, C), channel blocks ordered (py, px)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def _parity_routing(k_size: int):
    """R[u0, q, p, d0] in {0,1}: full-res tap offset d (= d0 - k//2) of a
    SAME conv maps, for output parity p and input parity q, onto packed-map
    offset u (= u0 - 1) iff  p + d = 2u + q. (numpy constant, built once
    at trace time)"""
    import numpy as np

    half = k_size // 2
    r = np.zeros((3, 2, 2, k_size), np.float32)
    for p in (0, 1):
        for d0 in range(k_size):
            d = d0 - half
            e = p + d
            u = e >> 1          # floor division (negative-safe)
            q = e - 2 * u
            if -1 <= u <= 1:
                r[u + 1, q, p, d0] = 1.0
    return r


def pack_conv_kernel(k: jax.Array) -> jax.Array:
    """Transform a full-resolution SAME-conv kernel (kh, kw, Cin, Cout),
    kh/kw odd and <= 5, into the equivalent (3, 3, 4*Cin, 4*Cout) kernel
    applied to the space-to-depth packed map (2x2, (py, px)-ordered
    channel blocks): conv_packed(s2d(x), pack_conv_kernel(k)) ==
    s2d(conv(x, k)) including the zero-padding border semantics.

    This is the inverse-direction counterpart of the sub-pixel up-conv
    collapse above: it lets the full-resolution decoder tail (conv1b, the
    prediction heads) run WITHOUT ever materializing the half-lane
    (..., 64) full-res map — the packed (..., 256) layout keeps the lane
    dimension full. The MXU does 4x the MACs (dense over parity pairs of
    which ~1/4 are structurally nonzero), a good trade at these shapes
    where the ops are layout/bandwidth-bound, not FLOP-bound
    (tools/bench_up5.py: conv1b at Cout=64 and 128 run in the same time).
    """
    kh, kw, cin, cout = k.shape
    assert kh % 2 == 1 and kw % 2 == 1 and kh <= 5 and kw <= 5, (kh, kw)
    ry = jnp.asarray(_parity_routing(kh), k.dtype)
    rx = jnp.asarray(_parity_routing(kw), k.dtype)
    # out[u, v, (q, r, i), (p, s, o)]
    kp = jnp.einsum("uqpd,vrse,deio->uvqripso", ry, rx, k)
    return kp.reshape(3, 3, 4 * cin, 4 * cout)


def pack_conv_kernel_w(k: jax.Array) -> jax.Array:
    """W-only counterpart of pack_conv_kernel: transform a full-resolution
    SAME-conv kernel (kh, kw, Cin, Cout), kw odd and <= 5, into the
    (kh, 3, 2*Cin, 2*Cout) kernel applied to the 1x2 W-packed map
    (columns space-to-depth'd, (px, c)-ordered channel blocks):
    conv_wpacked(wpack(x), pack_conv_kernel_w(k)) == wpack(conv(x, k)).

    2x the structural MACs of the full-res conv (vs 4x for the 2x2
    pack_conv_kernel) while still presenting 2*Cin >= 128 lanes to the
    MXU for the C=64 decoder tail — the sweet spot for conv1b, whose
    2x2-packed form is FLOP-bound at roofline (r4 xprof)."""
    kh, kw, cin, cout = k.shape
    assert kw % 2 == 1 and kw <= 5, (kh, kw)
    rx = jnp.asarray(_parity_routing(kw), k.dtype)
    # out[d, v, (r, i), (s, o)]
    kp = jnp.einsum("vrse,deio->dvriso", rx, k)
    return kp.reshape(kh, 3, 2 * cin, 2 * cout)


def pack22_to_w(x: jax.Array) -> jax.Array:
    """2x2-packed (B, H/2, W/2, 4C) [py, px, c] -> W-packed full-row-res
    (B, H, W/2, 2C) [px, c] (one transposed copy; unpacks rows only)."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, w2, 2 * c)


def w_to_pack22(x: jax.Array) -> jax.Array:
    """Inverse of pack22_to_w."""
    b, h, w2, c2 = x.shape
    c = c2 // 2
    x = x.reshape(b, h // 2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w2, 4 * c)


def _parity_routing_s2(k_size: int):
    """R[u0, s, p, d0] in {0,1}: tap offset d (= d0 - k//2) of a STRIDE-2
    SAME conv maps, for output parity p, onto double-packed input row
    offset u (= u0 - 1) and sub-position s (= full-res row mod 4) iff
    2p + d = 4u + s. (numpy constant, built once at trace time)"""
    import numpy as np

    half = k_size // 2
    r = np.zeros((3, 4, 2, k_size), np.float32)
    for p in (0, 1):
        for d0 in range(k_size):
            e = 2 * p + d0 - half
            u = e >> 2          # floor division by 4 (negative-safe)
            s = e - 4 * u
            if -1 <= u <= 1:
                r[u + 1, s, p, d0] = 1.0
    return r


def pack_stride2_conv_kernel(k: jax.Array) -> jax.Array:
    """Transform a STRIDE-2 SAME-conv kernel (kh, kw, Cin, Cout), kh/kw
    odd and <= 7, into the equivalent (3, 3, 16*Cin, 4*Cout) stride-1
    kernel applied to the DOUBLE space-to-depth packed input — channel
    blocks ordered (p2y, p2x, p1y, p1x, c), i.e. space_to_depth applied
    twice — producing the s2d-packed output:

        conv_1x1stride(s2d(s2d(x)), pack_stride2_conv_kernel(k))
          == s2d(conv_stride2(x, k))      [symmetric k//2 zero padding]

    Used by the packed ResNet stem (models/resnet.py): conv1's 4-channel
    input (4/128 lanes on the MXU's contraction axis) and 64-channel
    half-lane full-res output never materialize; the packed form
    contracts over 16*Cin = 64 lanes and emits 4*Cout = 256. ~3x the
    structural MACs of the direct stride-2 conv, on shapes that actually
    fill the MXU."""
    kh, kw, cin, cout = k.shape
    assert kh % 2 == 1 and kw % 2 == 1 and kh <= 7 and kw <= 7, (kh, kw)
    ry = jnp.asarray(_parity_routing_s2(kh), k.dtype)   # (3, 4, 2, kh)
    rx = jnp.asarray(_parity_routing_s2(kw), k.dtype)
    kp = jnp.einsum("uspa,vtqb,abio->uvstipqo", ry, rx, k)
    # split sy -> (p2y, p1y), sx -> (p2x, p1x)  [sy = 2*p2y + p1y], then
    # order input blocks (p2y, p2x, p1y, p1x, c) to match s2d(s2d(x)).
    kp = kp.reshape(3, 3, 2, 2, 2, 2, cin, 2, 2, cout)
    kp = kp.transpose(0, 1, 2, 4, 3, 5, 6, 7, 8, 9)
    return kp.reshape(3, 3, 16 * cin, 4 * cout)


def _upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x unpool in NHWC (reshape-broadcast). Used by the
    naive reference path and for the skip-free residual elsewhere."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _crop_to(x: jax.Array, h: int, w: int) -> jax.Array:
    return x[:, :h, :w, :]


def upconv5x5_subpixel(x: jax.Array, kernel: jax.Array,
                       dtype=jnp.bfloat16) -> jax.Array:
    """conv5x5_SAME(nearest_upsample_2x(x), kernel), computed as ONE 3x3
    conv to 4*Cout channels (the four parity classes' collapsed kernels
    stacked along Cout) followed by a depth-to-space interleave.
    kernel: (5, 5, Cin, Cout) float32.

    Exact (up to f32 summation order) including borders: SAME zero padding
    of the upsampled map by 2 corresponds to padding x by 1 in every
    parity class. The single wide conv beats 4 separate 3x3 convs and an
    lhs-dilated 6x6 conv on TPU (tools/bench_upconv.py: 3.0 vs 5.6 vs 5.6
    vs 31.6 ms naive at the final-block shape).
    """
    return upconv5x5_subpixel_multi(x, [kernel], dtype)[0]


def _collapsed_wide_kernel(kernels) -> jax.Array:
    """Stack the 4 parity-collapsed 3x3 kernels of each 5x5 up-conv kernel
    along Cout: (3, 3, Cin, n*4*Cout), channel blocks ordered
    (kernel, py, px)."""
    ks = []
    for kernel in kernels:
        for cy in (_C0, _C1):
            for cx in (_C0, _C1):
                ky = jnp.asarray(cy, kernel.dtype)
                kx = jnp.asarray(cx, kernel.dtype)
                ks.append(jnp.einsum("ua,vb,abio->uvio", ky, kx, kernel))
    return jnp.concatenate(ks, axis=-1)


def upconv5x5_subpixel_multi(x: jax.Array, kernels, dtype=jnp.bfloat16):
    """Apply upconv5x5_subpixel for several kernels sharing the same input
    in ONE conv (n * 4 * Cout output channels) — small-N convs on TPU are
    launch/layout-bound, so batching the branches along Cout is another
    ~2x (tools/bench_upconv.py). Returns a list of (B, 2H, 2W, Cout)."""
    b, h, w, cin = x.shape
    cout = kernels[0].shape[-1]
    assert all(k.shape[-1] == cout for k in kernels)
    kk = _collapsed_wide_kernel(kernels)        # (3, 3, Cin, n*4*Cout)
    y = lax.conv_general_dilated(
        x.astype(dtype), kk.astype(dtype), (1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n = len(kernels)
    # channel blocks ordered (kernel, py, px) with (py, px) =
    # (0,0), (0,1), (1,0), (1,1)
    y = y.reshape(b, h, w, n, 2, 2, cout)
    y = y.transpose(3, 0, 1, 4, 2, 5, 6)        # (n, b, h, py, w, px, cout)
    y = y.reshape(n, b, 2 * h, 2 * w, cout)
    return [y[i] for i in range(n)]


class UpProjBlock(nn.Module):
    """FCRN up-projection: unpool 2x, then (5x5 -> 3x3) + (5x5) branches,
    summed. The 5x5-on-upsampled convs run as sub-pixel 3x3 convs (module
    docstring); the skip contribution is a separate plain 5x5 conv added
    by linearity (== conv of the channel concat).

    If `out_hw` is given, conv outputs are cropped to it (odd-size
    handling); `skip` at call time is the reference's
    `Gudi_UpProj_Block_Cat` concatenation.
    """

    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None, train: bool = False):
        conv = lambda c, k, name: nn.Conv(  # noqa: E731
            c, (k, k), padding="SAME", use_bias=False, dtype=self.dtype,
            name=name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        cin = x.shape[-1]
        k1a = self.param("conv1a_up", nn.initializers.lecun_normal(),
                         (5, 5, cin, self.channels), jnp.float32)
        k2 = self.param("conv2_up", nn.initializers.lecun_normal(),
                        (5, 5, cin, self.channels), jnp.float32)

        a, c = upconv5x5_subpixel_multi(x, [k1a, k2], self.dtype)
        if out_hw is not None:
            a = _crop_to(a, *out_hw)
            c = _crop_to(c, *out_hw)
        if skip is not None:
            # Both skip branches in one conv (2*channels wide) for the
            # same small-N batching reason as the up-convs.
            cs = skip.shape[-1]
            ks1 = self.param("conv1a_skip", nn.initializers.lecun_normal(),
                             (5, 5, cs, self.channels), jnp.float32)
            ks2 = self.param("conv2_skip", nn.initializers.lecun_normal(),
                             (5, 5, cs, self.channels), jnp.float32)
            ksk = jnp.concatenate([ks1, ks2], axis=-1)
            sk = lax.conv_general_dilated(
                skip.astype(self.dtype), ksk.astype(self.dtype), (1, 1),
                padding=((2, 2), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            a = a + sk[..., :self.channels]
            c = c + sk[..., self.channels:]

        a = nn.relu(bn("bn1a")(a))
        a = bn("bn1b")(conv(self.channels, 3, "conv1b")(a))
        c = bn("bn2")(c)
        return nn.relu(a + c)


class PackedBatchNorm(nn.Module):
    """nn.BatchNorm evaluated on a space-to-depth packed map (B, H, W, 4C):
    statistics per REAL channel, pooled across the 4 parity blocks —
    numerically identical (up to f32 reduction order) to nn.BatchNorm on
    the depth-to-space'd full-resolution map, because the parity blocks
    ARE that map's pixels. Every elementwise pass runs in the full-lane
    4C layout instead of the half-lane C=64 one (tools/bench_bw.py:
    copy128 vs copy64). Parameter/batch_stats names and shapes match
    nn.BatchNorm(features=C), so checkpoints and the torch export are
    unchanged."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    # number of parity blocks in the packed channel dim: 4 for 2x2
    # space-to-depth, 2 for W-only (1x2) packing.
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        nb = self.n_blocks
        c = x.shape[-1] // nb
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if train:
            xf = x.astype(jnp.float32).reshape(*x.shape[:-1], nb, c)
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            mean2 = jnp.mean(xf * xf, axis=(0, 1, 2, 3))
            var = jnp.maximum(0.0, mean2 - mean * mean)  # flax fast-variance
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = lax.rsqrt(var + self.epsilon) * scale
        # packed channel order is (parity block, channel) with the channel
        # minor -> per-packed-channel vectors are n_blocks-fold tiles
        y = ((x.astype(jnp.float32) - jnp.tile(mean, nb))
             * jnp.tile(mul, nb) + jnp.tile(bias, nb))
        return y.astype(self.dtype)


class PackedUpProjBlock(nn.Module):
    """The final (no-skip) UpProjBlock computed ENTIRELY in the
    space-to-depth packed layout — the TPU fix for the full-resolution
    decoder tail (round-2 probes: every full-res op on the (..., 64) map
    is layout/bandwidth-bound at ~140-220 GB/s because 64 channels fill
    half the 128-lane registers, while the same bytes at (..., 256) move
    at full-lane rate).

    The (B, 2H, 2W, 64) full-res feature map is never materialized:
      * the two branch up-convs stay as the ONE wide 3x3 conv of the
        sub-pixel decomposition, minus its depth-to-space;
      * BatchNorms pool statistics across parity blocks (PackedBatchNorm,
        numerically identical);
      * conv1b (3x3, 64->64 at full res) becomes a 3x3 conv over the
        packed map with the parity-routed (3, 3, 256, 256) kernel
        (pack_conv_kernel) — 4x the MACs on the MXU, which measures the
        same wall time (the op was lane-bound, not FLOP-bound), with
        full-lane layouts everywhere around it.

    Returns the PACKED feature map (B, H, W, 4*channels); callers either
    depth-to-space it (intermediate blocks) or apply the heads in packed
    space too and interleave only the 9-channel head output
    (models/cspn_net.py). The optional skip (a FULL-RES (B, 2H, 2W, Cs)
    map) is consumed through space_to_depth with parity-routed 5x5 skip
    kernels. Parameter names/shapes are identical to UpProjBlock's, so
    the two paths share checkpoints and the torch export. Equivalence:
    tests/test_model.py.
    """

    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    # conv1b in W-only packing (2x structural MACs, full lanes) instead of
    # 2x2 (4x MACs). DEFAULT OFF — measured (r4, v5e, NYU headline): the
    # halved FLOPs lost to the two row-repack copies and XLA's layout
    # choices around them, combined 221.8 -> 170.6. The machinery stays
    # (correct, equivalence-tested) as the starting point if a future
    # XLA/Mosaic makes the repacks cheap.
    wpack_conv1b: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array | None = None,
                 train: bool = False, skip_packed: bool = False) -> jax.Array:
        # NOTE (r4, measured): running this wide conv on a STILL-PACKED
        # input (pack_conv_kernel of the collapsed kernel, d2s after) was
        # tried and REVERTED — the (3, 3, 4cin, 8*4ch) routed kernel ran
        # at ~22 TFLOP/s and the 8x-wider d2s added ~4 ms (NYU eval step
        # 32.3 -> 40.6 ms). The half-lane input conv below is the faster
        # real-world option; see docs/ARCHITECTURE.md "kernel design".
        cin = x.shape[-1]
        ch = self.channels
        k1a = self.param("conv1a_up", nn.initializers.lecun_normal(),
                         (5, 5, cin, ch), jnp.float32)
        k2 = self.param("conv2_up", nn.initializers.lecun_normal(),
                        (5, 5, cin, ch), jnp.float32)
        kk = _collapsed_wide_kernel([k1a, k2])   # (3, 3, cin, 8*ch)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), kk.astype(self.dtype), (1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        a, c = y[..., :4 * ch], y[..., 4 * ch:]  # packed branch maps

        if skip is not None:
            # skip_packed: the caller hands the skip already in s2d form
            # (the packed encoder stem) — its real channel count is 1/4
            # of the array's.
            cs = skip.shape[-1] // 4 if skip_packed else skip.shape[-1]
            ks1 = self.param("conv1a_skip", nn.initializers.lecun_normal(),
                             (5, 5, cs, ch), jnp.float32)
            ks2 = self.param("conv2_skip", nn.initializers.lecun_normal(),
                             (5, 5, cs, ch), jnp.float32)
            # Per-branch packed kernels concatenated along Cout so the
            # output channel blocks stay branch-major like (a, c).
            kp = jnp.concatenate(
                [pack_conv_kernel(ks1), pack_conv_kernel(ks2)], axis=-1)
            skip_s2d = skip if skip_packed else space_to_depth(skip)
            sk = lax.conv_general_dilated(
                skip_s2d.astype(self.dtype),
                kp.astype(self.dtype), (1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            a = a + sk[..., :4 * ch]
            c = c + sk[..., 4 * ch:]

        a = nn.relu(PackedBatchNorm(dtype=self.dtype, name="bn1a")(a, train))
        k1b = _KernelParam((3, 3, ch, ch), name="conv1b")()
        if self.wpack_conv1b:
            # conv1b in W-only (1x2) packing: the 2x2-packed form is
            # FLOP-bound at roofline paying 4x structural MACs (r4 xprof:
            # its weight grad alone ~3% of the KITTI train step); the
            # W-packed kernel pays 2x on the same >= 128-lane layout.
            # Cost: two cheap repack copies (rows unpack/repack only);
            # bn1b pools stats across 2 parity blocks (same params).
            aw = pack22_to_w(a)
            aw = lax.conv_general_dilated(
                aw, pack_conv_kernel_w(k1b).astype(self.dtype), (1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            aw = PackedBatchNorm(dtype=self.dtype, n_blocks=2,
                                 name="bn1b")(aw, train)
            a = w_to_pack22(aw)
        else:
            a = lax.conv_general_dilated(
                a, pack_conv_kernel(k1b).astype(self.dtype), (1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            a = PackedBatchNorm(dtype=self.dtype, name="bn1b")(a, train)
        c = PackedBatchNorm(dtype=self.dtype, name="bn2")(c, train)
        return nn.relu(a + c)


class _KernelParam(nn.Module):
    """A bare conv-kernel parameter registered under `<name>/kernel` — the
    same variable path nn.Conv(name=<name>) uses, so the packed and
    unpacked block variants share parameter trees."""

    shape: tuple

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class UpConvBlock(nn.Module):
    """Single-branch up-convolution (the reference's
    `Simple_Gudi_UpConv_Block`): unpool 2x -> 5x5 conv -> BN -> ReLU, with
    the optional skip added by linearity as in UpProjBlock. Runs the same
    sub-pixel decomposition as UpProjBlock."""

    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None, train: bool = False):
        cin = x.shape[-1]
        k = self.param("conv_up", nn.initializers.lecun_normal(),
                       (5, 5, cin, self.channels), jnp.float32)
        y = upconv5x5_subpixel(x, k, self.dtype)
        if out_hw is not None:
            y = _crop_to(y, *out_hw)
        if skip is not None:
            y = y + nn.Conv(self.channels, (5, 5), padding="SAME",
                            use_bias=False, dtype=self.dtype,
                            name="conv_skip")(skip.astype(self.dtype))
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)


_BLOCKS = {"upproj": UpProjBlock, "upconv": UpConvBlock}


class UpProjDecoder(nn.Module):
    """Four UpProj-with-skip blocks /32 -> /2, then a final up to full res.

    Input: the encoder pyramid (stem, c1, c2, c3, c4); output: a
    `channels_out`-wide full-resolution feature map for the heads.
    `block` selects the up block family: "upproj" (Gudi_UpProj_Block_Cat,
    the headline) or "upconv" (Simple_Gudi_UpConv_Block).
    """

    channels: tuple[int, ...] = (512, 256, 128, 64)
    channels_out: int = 64
    block: str = "upproj"
    dtype: jnp.dtype = jnp.bfloat16
    # When True and the final block's geometry allows it (out_hw exactly
    # 2x the /2 map, "upproj" family), the final block runs in the
    # space-to-depth packed layout (PackedUpProjBlock) and the decoder
    # RETURNS THE PACKED MAP (B, H/2, W/2, 4*channels_out) — the caller
    # must apply its heads packed (models/cspn_net.py). The parameter
    # tree is identical either way.
    packed_tail: bool = False

    def tail_is_packed(self, out_hw: tuple[int, int]) -> bool:
        return (self.packed_tail and self.block == "upproj"
                and out_hw[0] % 2 == 0 and out_hw[1] % 2 == 0)

    def _pack_block(self, ch: int, in_hw, out_hw) -> bool:
        """Pack an intermediate block iff its geometry is an exact 2x (no
        odd-size crop) and its width is below the 128-lane boundary —
        above it the layout is already full-lane and the packed conv's 4x
        MACs would only cost (the deep blocks run at 74-85% MXU as-is)."""
        return (self.packed_tail and self.block == "upproj" and ch < 128
                and tuple(out_hw) == (2 * in_hw[0], 2 * in_hw[1]))

    @nn.compact
    def __call__(self, skips, out_hw: tuple[int, int], train: bool = False,
                 stem_packed: bool = False):
        # stem_packed: the encoder delivered the stem skip in s2d-packed
        # form (B, H/4, W/4, 4C) (models/resnet.py packed stem); a packed
        # up block consumes it directly, anything else depth-to-spaces it.
        stem, c1, c2, c3, c4 = skips
        block_cls = _BLOCKS[self.block]

        # Bottleneck halving the deepest width: 2048 -> 1024 for ResNet-50
        # (SURVEY.md section 3.3); scales with the encoder width.
        x = nn.Conv(c4.shape[-1] // 2, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="bottleneck")(c4)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bottleneck_bn")(x)
        x = nn.relu(x)

        for i, (ch, skip) in enumerate(
                zip(self.channels, (c3, c2, c1, stem))):
            is_stem = i == len(self.channels) - 1
            skip_is_packed = stem_packed and is_stem
            target = (tuple(2 * d for d in skip.shape[1:3])
                      if skip_is_packed else skip.shape[1:3])
            if self._pack_block(ch, x.shape[1:3], target):
                # Sub-128-channel blocks whose geometry is an exact 2x run
                # packed (half-lane layout fix); depth-to-space once for
                # the next block's input.
                xp = PackedUpProjBlock(
                    ch, dtype=self.dtype, name=f"upproj{i + 1}")(
                    x, skip=skip, train=train, skip_packed=skip_is_packed)
                x = depth_to_space(xp)
            else:
                if skip_is_packed:
                    skip = depth_to_space(skip)
                x = block_cls(ch, dtype=self.dtype, name=f"upproj{i + 1}")(
                    x, skip=skip, out_hw=target, train=train)

        # Final up-projection /2 -> full resolution, no skip.
        if self.tail_is_packed(out_hw):
            return PackedUpProjBlock(
                self.channels_out, dtype=self.dtype, name="upproj5")(
                x, train=train)
        x = block_cls(self.channels_out, dtype=self.dtype, name="upproj5")(
            x, out_hw=out_hw, train=train)
        return x
