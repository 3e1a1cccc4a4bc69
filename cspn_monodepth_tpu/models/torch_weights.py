"""Import torchvision-style ResNet-50 weights into the Flax encoder.

The reference initializes its encoder from ImageNet-pretrained torchvision
ResNet-50 (`resnet50(pretrained=True)`, SURVEY.md R3). This environment has
no network access, but users migrating from the reference have the .pth
file — this module maps a torchvision state_dict onto
`cspn_monodepth_tpu.models.ResNetEncoder` params.

Layout notes:
* torch conv weight (O, I, kH, kW) -> flax (kH, kW, I, O)
* torch BN {weight, bias, running_mean, running_var} ->
  flax {scale, bias} in params + {mean, var} in batch_stats
* torchvision names layerL.B.convN / bnN / downsample.{0,1} ->
  ours layer{L}_block{B}.{convN, bnN, conv_proj, bn_proj}
* For rgbd (4-channel conv1) the extra input channel is initialized to the
  mean of the RGB filters (SURVEY.md section 4.3 note).
"""

from __future__ import annotations

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def convert_torch_resnet(state_dict, in_channels: int = 3,
                         arch: str = "resnet50"):
    """Return (params, batch_stats) pytrees for ResNetEncoder.

    state_dict: a mapping name -> tensor/ndarray in torchvision ResNet
    layout (torch tensors or numpy arrays both work). arch selects the
    stage sizes and block kind (resnet18/34 = basic 2-conv blocks,
    resnet50 = bottleneck 3-conv blocks), matching models/resnet.py ARCHS.
    """
    from cspn_monodepth_tpu.models.resnet import ARCHS

    stage_sizes, block = ARCHS[arch]
    n_convs = {"basic": 2, "bottleneck": 3}[block]
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put_bn(dst: str, src: str):
        params[dst] = {"scale": sd[f"{src}.weight"].astype(np.float32),
                       "bias": sd[f"{src}.bias"].astype(np.float32)}
        stats[dst] = {"mean": sd[f"{src}.running_mean"].astype(np.float32),
                      "var": sd[f"{src}.running_var"].astype(np.float32)}

    w1 = _conv(sd["conv1.weight"])            # (7, 7, 3, 64)
    if in_channels == 4:
        extra = w1.mean(axis=2, keepdims=True)
        w1 = np.concatenate([w1, extra], axis=2)
    elif in_channels == 1:
        w1 = w1.mean(axis=2, keepdims=True)
    elif in_channels != 3:
        raise ValueError(f"unsupported in_channels {in_channels}")
    params["conv1"] = {"kernel": w1}
    put_bn("bn1", "bn1")

    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for blk in range(n_blocks):
            src = f"layer{stage}.{blk}"
            dst = f"layer{stage}_block{blk}"
            blk_p: dict = {}
            for i in range(1, n_convs + 1):
                blk_p[f"conv{i}"] = {"kernel": _conv(sd[f"{src}.conv{i}.weight"])}
            if f"{src}.downsample.0.weight" in sd:
                blk_p["conv_proj"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])}
            params[dst] = blk_p
            sub_stats: dict = {}
            for i in range(1, n_convs + 1):
                b = f"{src}.bn{i}"
                blk_p[f"bn{i}"] = {"scale": sd[f"{b}.weight"].astype(np.float32),
                                   "bias": sd[f"{b}.bias"].astype(np.float32)}
                sub_stats[f"bn{i}"] = {
                    "mean": sd[f"{b}.running_mean"].astype(np.float32),
                    "var": sd[f"{b}.running_var"].astype(np.float32)}
            if f"{src}.downsample.1.weight" in sd:
                b = f"{src}.downsample.1"
                blk_p["bn_proj"] = {"scale": sd[f"{b}.weight"].astype(np.float32),
                                    "bias": sd[f"{b}.bias"].astype(np.float32)}
                sub_stats["bn_proj"] = {
                    "mean": sd[f"{b}.running_mean"].astype(np.float32),
                    "var": sd[f"{b}.running_var"].astype(np.float32)}
            stats[dst] = sub_stats
    return params, stats


# Backward-compatible alias (resnet50 was the original only arch).
def convert_torch_resnet50(state_dict, in_channels: int = 3):
    return convert_torch_resnet(state_dict, in_channels, arch="resnet50")


def load_pretrained_encoder(variables, path_or_state_dict, in_channels=3,
                            arch: str = "resnet50"):
    """Graft torchvision ResNet weights into a CSPNDepthNet/encoder
    variables pytree (returns a new pytree; decoder/head params untouched).
    """
    if isinstance(path_or_state_dict, (str, bytes)):
        import torch

        sd = torch.load(path_or_state_dict, map_location="cpu",
                        weights_only=True)
    else:
        sd = path_or_state_dict
    params, stats = convert_torch_resnet(sd, in_channels, arch=arch)

    def merge(base, overlay, path=""):
        """Recursively replace leaves of `base` with `overlay` (shape-checked),
        returning new dicts — `base` is not mutated."""
        if not isinstance(overlay, dict):
            assert tuple(base.shape) == tuple(overlay.shape), (
                f"{path}: {base.shape} vs {overlay.shape}")
            return overlay
        out = dict(base)
        for k, v in overlay.items():
            assert k in base, f"{path}/{k} missing in flax tree"
            out[k] = merge(base[k], v, f"{path}/{k}")
        return out

    new = dict(variables)
    new["params"] = dict(variables["params"])
    new["params"]["encoder"] = merge(
        variables["params"]["encoder"], params, "params/encoder")
    new["batch_stats"] = dict(variables["batch_stats"])
    new["batch_stats"]["encoder"] = merge(
        variables["batch_stats"]["encoder"], stats, "batch_stats/encoder")
    return new
