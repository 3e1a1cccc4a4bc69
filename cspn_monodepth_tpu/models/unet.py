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


def upconv5x5_subpixel_multi(x: jax.Array, kernels, dtype=jnp.bfloat16):
    """Apply upconv5x5_subpixel for several kernels sharing the same input
    in ONE conv (n * 4 * Cout output channels) — small-N convs on TPU are
    launch/layout-bound, so batching the branches along Cout is another
    ~2x (tools/bench_upconv.py). Returns a list of (B, 2H, 2W, Cout)."""
    b, h, w, cin = x.shape
    cout = kernels[0].shape[-1]
    ks = []
    for kernel in kernels:
        assert kernel.shape[-1] == cout
        for cy in (_C0, _C1):
            for cx in (_C0, _C1):
                ky = jnp.asarray(cy, kernel.dtype)
                kx = jnp.asarray(cx, kernel.dtype)
                ks.append(jnp.einsum("ua,vb,abio->uvio", ky, kx, kernel))
    kk = jnp.concatenate(ks, axis=-1)           # (3, 3, Cin, n*4*Cout)
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

    @nn.compact
    def __call__(self, skips, out_hw: tuple[int, int], train: bool = False):
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
            x = block_cls(ch, dtype=self.dtype, name=f"upproj{i + 1}")(
                x, skip=skip, out_hw=skip.shape[1:3], train=train)

        # Final up-projection /2 -> full resolution, no skip.
        x = block_cls(self.channels_out, dtype=self.dtype, name="upproj5")(
            x, out_hw=out_hw, train=train)
        return x
