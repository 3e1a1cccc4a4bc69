"""The full depth network: ResNet-50 UNet + heads + CSPN refinement.

Functional equivalent of the reference model (upstream name
`torch_resnet_cspn_nyu.py`, SURVEY.md R3-R6 and section 3.3):

  input (B, H, W, 3|4)  [rgb | rgb+sparse-depth]
    -> ResNet-50 encoder -> UpProj decoder (skip concat)
    -> blur-depth head (1ch) + guidance head (8ch)
    -> CSPN propagation (num_iters, optional sparse anchoring)
    -> refined depth (B, H, W, 1)

The heads and CSPN run in float32 (depth precision matters); the
encoder/decoder compute in bfloat16 on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cspn_monodepth_tpu.models.resnet import ResNetEncoder
from cspn_monodepth_tpu.models.unet import UpProjDecoder
from cspn_monodepth_tpu.ops.cspn import cspn_propagate


class CSPNDepthNet(nn.Module):
    """ResNet-50 UNet with CSPN refinement head.

    modality: "rgb" (3ch input, monocular depth estimation) or "rgbd"
      (4ch input with the sparse depth concatenated; the sparse map is
      also used for CSPN anchor replacement).
    """

    modality: str = "rgbd"
    num_iters: int = 24
    norm_type: str = "8sum_clamp"
    cspn_impl: str = "auto"
    dtype: jnp.dtype = jnp.bfloat16
    # Encoder family: "resnet18" | "resnet34" | "resnet50" presets
    # (models/resnet.py ARCHS), or None to use the explicit
    # encoder_stages/encoder_block fields (tiny test archs).
    arch: str | None = "resnet50"
    encoder_stages: tuple = (3, 4, 6, 3)    # ResNet-50
    encoder_block: str = "bottleneck"
    encoder_width: int = 64
    decoder_channels: tuple = (512, 256, 128, 64)
    decoder_out: int = 64
    decoder_block: str = "upproj"           # upproj | upconv
    # Run the final decoder block + heads in the space-to-depth packed
    # layout (models/unet.py PackedUpProjBlock docstring): the half-lane
    # (..., 64) full-resolution feature map is never materialized; only
    # the 9-channel head output is interleaved to full res. Numerically
    # equivalent (tests/test_model.py), parameter tree identical.
    packed_tail: bool = True
    # Run the encoder stem packed too (models/resnet.py): conv1's
    # 4-channel contraction and half-lane (H/2, W/2, 64) stem map never
    # materialize; the stem skip flows to the decoder in packed form.
    # Active when H and W divide by 4. Numerically equivalent, parameter
    # tree identical.
    packed_stem: bool = True
    # When set (a jax.sharding.Mesh with a "spatial" axis of size > 1), the
    # CSPN refinement runs through the explicit shard_map halo-exchange
    # path (parallel/halo.py) instead of relying on XLA auto-SPMD.
    spatial_mesh: object = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        if self.modality == "rgbd":
            assert x.shape[-1] == 4, f"rgbd expects 4ch, got {x.shape}"
            sparse_depth = x[..., 3:4].astype(jnp.float32)
        elif self.modality == "rgb":
            assert x.shape[-1] == 3, f"rgb expects 3ch, got {x.shape}"
            sparse_depth = None
        elif self.modality == "d":
            assert x.shape[-1] == 1, f"d expects 1ch, got {x.shape}"
            sparse_depth = x[..., 0:1].astype(jnp.float32)
        else:
            raise ValueError(f"unknown modality: {self.modality!r}")

        h, w = x.shape[1:3]
        if self.arch is not None:
            from cspn_monodepth_tpu.models.resnet import ARCHS
            stages, block = ARCHS[self.arch]
        else:
            stages, block = tuple(self.encoder_stages), self.encoder_block
        encoder = ResNetEncoder(
            stage_sizes=stages,
            block=block,
            width=self.encoder_width,
            dtype=self.dtype,
            packed_stem=self.packed_stem, name="encoder")
        skips = encoder(x, train=train)
        decoder = UpProjDecoder(
            channels=tuple(self.decoder_channels),
            channels_out=self.decoder_out,
            block=self.decoder_block,
            dtype=self.dtype,
            packed_tail=self.packed_tail, name="decoder")
        feat = decoder(skips, out_hw=(h, w), train=train,
                       stem_packed=encoder.stem_is_packed(h, w))
        packed = decoder.tail_is_packed((h, w))

        # Heads (SURVEY.md R5): 1ch blur depth + 8ch guidance.
        # Zero-init: with "8sum_clamp" normalization the CSPN then starts
        # as the identity map, which is what makes from-scratch training
        # stable (no pretrained encoder is available in this environment).
        # Both heads run as ONE f32 conv (9 out = 1 depth + 8 guidance):
        # two separate convs would read the full-resolution f32 feature
        # twice; the math is identical with the kernels concatenated.
        # With a packed decoder tail the conv runs in packed space (the
        # parity-routed kernel, models/unet.py pack_conv_kernel) and only
        # its 9-channel output is interleaved to full resolution.
        cf = self.decoder_out
        kd = self.param("depth_head_kernel", nn.initializers.zeros,
                        (3, 3, cf, 1), jnp.float32)
        bd = self.param("depth_head_bias", nn.initializers.zeros,
                        (1,), jnp.float32)
        kg = self.param("guidance_head_kernel", nn.initializers.zeros,
                        (3, 3, cf, 8), jnp.float32)
        bg = self.param("guidance_head_bias", nn.initializers.zeros,
                        (8,), jnp.float32)
        kk = jnp.concatenate([kd, kg], axis=-1)
        bias = jnp.concatenate([bd, bg])
        if packed and self.spatial_mesh is None:
            # Packed head -> PLANE-MAJOR (B, 9, H, W) in ONE rearrange:
            # the CSPN kernel wants plane-major gates, and going through
            # the channels-last (B, H, W, 9) intermediate costs XLA a
            # chain of layout copies (~4% of the eval step in the r4
            # xprof trace). Packed channel order is (py, px, c)
            # (models/unet.py space_to_depth), so full-res row = 2i + py,
            # col = 2j + px.
            from cspn_monodepth_tpu.models.unet import pack_conv_kernel

            heads_p = jax.lax.conv_general_dilated(
                feat.astype(jnp.float32), pack_conv_kernel(kk), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bq, h2, w2, _ = heads_p.shape
            heads_pm = (heads_p.reshape(bq, h2, w2, 2, 2, 9)
                        .transpose(0, 5, 1, 3, 2, 4)
                        .reshape(bq, 9, h, w))
            heads_pm = heads_pm + bias[None, :, None, None]
            refined = cspn_propagate(
                heads_pm[:, 1:], heads_pm[:, 0], sparse_depth,
                num_iters=self.num_iters, norm_type=self.norm_type,
                impl=self.cspn_impl, guidance_layout="NCHW")
            return refined[..., None]

        if packed:
            from cspn_monodepth_tpu.models.unet import (
                depth_to_space, pack_conv_kernel)

            heads = jax.lax.conv_general_dilated(
                feat.astype(jnp.float32), pack_conv_kernel(kk), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            heads = depth_to_space(heads)          # (B, H, W, 9)
        else:
            heads = jax.lax.conv_general_dilated(
                feat.astype(jnp.float32), kk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        heads = heads + bias
        blur_depth = heads[..., 0:1]
        guidance = heads[..., 1:9]

        if self.spatial_mesh is not None:
            from cspn_monodepth_tpu.parallel.halo import cspn_propagate_spatial

            # "jnp" forces the scan slab body; any pallas-flavoured impl
            # ("auto"/"pallas"/"pallas_tiled") lets the spatial path pick
            # the fused slab kernel when the halo'd slab fits VMEM.
            spatial_impl = "jnp" if self.cspn_impl == "jnp" else "auto"
            refined = cspn_propagate_spatial(
                guidance, blur_depth, sparse_depth,
                mesh=self.spatial_mesh, num_iters=self.num_iters,
                norm_type=self.norm_type, impl=spatial_impl)
        else:
            refined = cspn_propagate(
                guidance, blur_depth, sparse_depth,
                num_iters=self.num_iters, norm_type=self.norm_type,
                impl=self.cspn_impl)
        return refined
