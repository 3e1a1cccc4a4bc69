"""ResNet encoder for the depth network, in Flax linen (NHWC).

Functional equivalent of the reference's torchvision-style ResNet-50
encoder (SURVEY.md R3): conv1 7x7/s2 (widened to 4 input channels for RGBD
completion), BN+ReLU, 3x3/s2 maxpool, then bottleneck stages [3,4,6,3]
producing /4, /8, /16, /32 features with 256/512/1024/2048 channels.

TPU-first choices:
* channels-last (NHWC) layout — XLA's native conv layout on TPU;
* `dtype` (compute dtype) defaults to bfloat16 so convs hit the MXU at
  full rate while params stay float32;
* BatchNorm batch statistics are computed over the *global* (sharded)
  batch automatically under pjit — jnp.mean over a batch-sharded array
  lowers to a psum across the "data" mesh axis, i.e. sync-BN for free
  (SURVEY.md section 8 "BatchNorm under DP").

No ImageNet-pretrained weights are loaded: the build environment has no
network access (SURVEY.md section 0), so training is from scratch.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with identity/projection shortcut."""

    channels: int            # bottleneck width; output is 4x this
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        # Explicit symmetric (torch-style) padding rather than SAME: for
        # stride-2 convs on even inputs SAME pads asymmetrically (low=0),
        # shifting the window grid by one pixel vs torch — symmetric
        # padding keeps torchvision-pretrained weights exactly portable
        # (models/torch_weights.py, tests/test_torch_weights.py).
        conv = lambda c, k, s, name: nn.Conv(  # noqa: E731
            c, (k, k), strides=(s, s),
            padding=((k // 2, k // 2), (k // 2, k // 2)), use_bias=False,
            dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        residual = x
        y = nn.relu(bn("bn1")(conv(self.channels, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.channels, 3, self.strides, "conv2")(y)))
        y = bn("bn3")(conv(self.channels * 4, 1, 1, "conv3")(y))

        if residual.shape != y.shape:
            residual = bn("bn_proj")(
                conv(self.channels * 4, 1, self.strides, "conv_proj")(x))
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """3x3 -> 3x3 basic residual block (ResNet-18/34 variants; the upstream
    CSPN repo ships both a resnet18 and a resnet50 model)."""

    channels: int            # output channels (1x expansion)
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        conv = lambda c, k, s, name: nn.Conv(  # noqa: E731
            c, (k, k), strides=(s, s),
            padding=((k // 2, k // 2), (k // 2, k // 2)), use_bias=False,
            dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        residual = x
        y = nn.relu(bn("bn1")(conv(self.channels, 3, self.strides, "conv1")(x)))
        y = bn("bn2")(conv(self.channels, 3, 1, "conv2")(y))

        if residual.shape != y.shape:
            residual = bn("bn_proj")(
                conv(self.channels, 1, self.strides, "conv_proj")(x))
        return nn.relu(y + residual)


def packed_stem_maxpool(sp: jax.Array, c: int) -> jax.Array:
    """3x3 stride-2 max pool of the full-resolution map represented by its
    space-to-depth packing sp (B, Hq, Wq, 4c) -> (B, Hq, Wq, c).

    Full-res rows 2m-1..2m+1 live in packed rows m-1 (parity 1) and m
    (parities 0, 1), so the pool is an elementwise max over 9 shifted
    channel-block views — the half-lane full-res map is never
    materialized. Matches nn.max_pool(window (3,3), stride 2,
    padding ((1,1),(1,1))) exactly (flax pads max_pool with -inf).
    """
    hq, wq = sp.shape[1:3]
    p = jnp.pad(sp, ((0, 0), (1, 0), (1, 0), (0, 0)),
                constant_values=-jnp.inf)
    taps = ((-1, 1), (0, 0), (0, 1))    # (packed shift, parity)
    out = None
    for du, py in taps:
        for dv, px in taps:
            t = p[:, 1 + du:1 + du + hq, 1 + dv:1 + dv + wq,
                  (2 * py + px) * c:(2 * py + px + 1) * c]
            out = t if out is None else jnp.maximum(out, t)
    return out


# arch name -> (stage_sizes, block kind). Expansion is 1 for basic, 4 for
# bottleneck, so skip widths are 64/128/256/512 (r18/34) vs 256/.../2048.
ARCHS = {
    "resnet18": ((2, 2, 2, 2), "basic"),
    "resnet34": ((3, 4, 6, 3), "basic"),
    "resnet50": ((3, 4, 6, 3), "bottleneck"),
}


class ResNetEncoder(nn.Module):
    """ResNet-v1 encoder returning the skip pyramid.

    Returns (stem, c1, c2, c3, c4):
      stem: /2, 64ch (post conv1+BN+ReLU, pre-pool)
      c1..c4: /4, /8, /16, /32 with 256/512/1024/2048 channels for
      bottleneck blocks (ResNet-50) or 64/128/256/512 for basic blocks
      (ResNet-18/34).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)   # ResNet-50
    width: int = 64
    block: str = "bottleneck"                   # "bottleneck" | "basic"
    dtype: jnp.dtype = jnp.bfloat16
    # Run the stem in space-to-depth packed layout when H and W divide by
    # 4 (stem_is_packed): conv1's 4-channel contraction (4/128 MXU lanes)
    # becomes a 16*Cin-deep conv on the double-packed input, and the
    # half-lane (H/2, W/2, 64) stem map is never materialized — BN runs
    # packed (PackedBatchNorm), the pool reads packed channel blocks, and
    # the stem SKIP is returned PACKED (B, H/4, W/4, 4*width); callers
    # check stem_is_packed(). Parameter tree is identical either way.
    packed_stem: bool = False

    def stem_is_packed(self, h: int, w: int) -> bool:
        return self.packed_stem and h % 4 == 0 and w % 4 == 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        h, w = x.shape[1:3]
        if self.stem_is_packed(h, w):
            from cspn_monodepth_tpu.models.unet import (
                PackedBatchNorm,
                _KernelParam,
                pack_stride2_conv_kernel,
                space_to_depth,
            )

            k = _KernelParam((7, 7, x.shape[-1], self.width),
                             name="conv1")()
            x2 = space_to_depth(space_to_depth(x))
            y = lax.conv_general_dilated(
                x2, pack_stride2_conv_kernel(k).astype(self.dtype), (1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = PackedBatchNorm(dtype=self.dtype, name="bn1")(y, train)
            stem = nn.relu(y)               # PACKED (B, H/4, W/4, 4*width)
            x = packed_stem_maxpool(stem, self.width)
        else:
            # torch-style symmetric padding throughout (Bottleneck note).
            x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
            stem = nn.relu(x)
            x = nn.max_pool(stem, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        block_cls = {"bottleneck": Bottleneck, "basic": BasicBlock}[self.block]
        skips = [stem]
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    channels=self.width * (2 ** stage),
                    strides=strides,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train=train)
            skips.append(x)
        return tuple(skips)
