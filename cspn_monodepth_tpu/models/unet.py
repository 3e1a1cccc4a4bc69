"""UNet decoder with FCRN-style UpProj blocks (Flax linen, NHWC).

Functional equivalent of the reference's decoder (SURVEY.md R4): four
up-projection blocks with encoder skip concatenation — the upstream names
are `Gudi_UpProj_Block` / `Gudi_UpProj_Block_Cat` (Laina et al. FCRN
design): after a 2x nearest unpool, two branches (5x5 -> 3x3 conv, and a
single 5x5 conv), each BN'd, summed, ReLU'd.

Odd spatial sizes (228x304 is not divisible by 32) are handled by cropping
the upsampled map to the skip's H x W — shapes stay static under jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x unpool in NHWC (cheap: reshape-broadcast)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _crop_to(x: jax.Array, h: int, w: int) -> jax.Array:
    return x[:, :h, :w, :]


class UpProjBlock(nn.Module):
    """FCRN up-projection: unpool 2x, then (5x5->3x3) + (5x5) branches, sum.

    If `out_hw` is given, the unpooled map is cropped to it (odd-size
    handling); if `skip` is passed at call time it is concatenated after
    unpooling (the reference's `Gudi_UpProj_Block_Cat`).
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

        x = _upsample2x(x)
        if out_hw is not None:
            x = _crop_to(x, *out_hw)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)

        a = nn.relu(bn("bn1a")(conv(self.channels, 5, "conv1a")(x)))
        a = bn("bn1b")(conv(self.channels, 3, "conv1b")(a))
        b = bn("bn2")(conv(self.channels, 5, "conv2")(x))
        return nn.relu(a + b)


class UpProjDecoder(nn.Module):
    """Four UpProj-with-skip blocks /32 -> /2, then a final up to full res.

    Input: the encoder pyramid (stem, c1, c2, c3, c4); output: a
    `channels_out`-wide full-resolution feature map for the heads.
    """

    channels: tuple[int, ...] = (512, 256, 128, 64)
    channels_out: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, skips, out_hw: tuple[int, int], train: bool = False):
        stem, c1, c2, c3, c4 = skips

        # Bottleneck halving the deepest width: 2048 -> 1024 for ResNet-50
        # (SURVEY.md section 3.3); scales with the encoder width.
        x = nn.Conv(c4.shape[-1] // 2, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="bottleneck")(c4)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bottleneck_bn")(x)
        x = nn.relu(x)

        for i, (ch, skip) in enumerate(
                zip(self.channels, (c3, c2, c1, stem))):
            x = UpProjBlock(ch, dtype=self.dtype, name=f"upproj{i + 1}")(
                x, skip=skip, out_hw=skip.shape[1:3], train=train)

        # Final up-projection /2 -> full resolution, no skip.
        x = UpProjBlock(self.channels_out, dtype=self.dtype, name="upproj5")(
            x, out_hw=out_hw, train=train)
        return x
