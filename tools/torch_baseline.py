"""PyTorch baseline: the reference architecture, reimplemented from
SURVEY.md section 4 for throughput measurement.

The reference repo published no img/s numbers and this environment has no
GPU, so this torch-CPU implementation is the only measurable PyTorch
baseline (BASELINE.md "reference throughput: unknown"). It is written from
the functional spec — ResNet-50 UNet encoder-decoder with UpProj blocks,
blur-depth + 8ch guidance heads, and the per-iteration CSPN loop exactly as
the reference structures it (per-iteration torch elementwise ops, SURVEY.md
R6) — NOT from reference code (the mount was empty).

Usage: python tools/torch_baseline.py   # writes BENCH_BASELINE.json
"""

from __future__ import annotations

import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)


class UpProj(nn.Module):
    """FCRN up-projection. `crop_after=False` (default) crops the
    upsampled map to out_hw BEFORE the 5x5 convs; `crop_after=True` convs
    the full 2Hx2W map and crops the conv OUTPUTS — the ordering the flax
    decoder's sub-pixel decomposition implies (models/unet.py docstring:
    both are valid SAME-conv semantics; they differ only in the last
    row/col at odd sizes). The second mode zero-extends the skip to the
    upsampled size, which is exactly SAME zero padding of an out_hw-sized
    skip once the output is cropped."""

    def __init__(self, cin, cout, crop_after=False):
        super().__init__()
        self.crop_after = crop_after
        self.c1a = nn.Conv2d(cin, cout, 5, padding=2, bias=False)
        self.b1a = nn.BatchNorm2d(cout)
        self.c1b = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.b1b = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cin, cout, 5, padding=2, bias=False)
        self.b2 = nn.BatchNorm2d(cout)

    def forward(self, x, out_hw, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if self.crop_after:
            if skip is not None:
                skip = F.pad(skip, (0, x.shape[3] - skip.shape[3],
                                    0, x.shape[2] - skip.shape[2]))
                x = torch.cat([x, skip], dim=1)
            a = self.c1a(x)[:, :, :out_hw[0], :out_hw[1]]
            b = self.c2(x)[:, :, :out_hw[0], :out_hw[1]]
        else:
            x = x[:, :, :out_hw[0], :out_hw[1]]
            if skip is not None:
                x = torch.cat([x, skip], dim=1)
            a, b = self.c1a(x), self.c2(x)
        a = self.b1b(self.c1b(F.relu(self.b1a(a))))
        b = self.b2(b)
        return F.relu(a + b)


class AffinityPropagate(nn.Module):
    """Reference-style CSPN loop: per-iteration elementwise ops."""

    def __init__(self, prop_time=24):
        super().__init__()
        self.prop_time = prop_time
        self.offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
                        (0, 1), (1, -1), (1, 0), (1, 1)]

    def forward(self, guidance, blur, sparse=None):
        # guidance (B,8,H,W), blur/sparse (B,1,H,W)
        g = guidance
        s = g.abs().sum(dim=1, keepdim=True).clamp_min(1e-8)
        gate = g / s
        g0 = 1.0 - gate.sum(dim=1, keepdim=True)
        d = blur
        if sparse is not None:
            m = (sparse > 0).float()
            d = (1 - m) * d + m * sparse
        b, _, h, w = d.shape
        for _ in range(self.prop_time):
            pad = F.pad(d, (1, 1, 1, 1))
            new = g0 * d
            for k, (dy, dx) in enumerate(self.offsets):
                new = new + gate[:, k:k + 1] * pad[:, :, 1 + dy:1 + dy + h,
                                                   1 + dx:1 + dx + w]
            if sparse is not None:
                new = (1 - m) * new + m * sparse
            d = new
        return d


class TorchCSPNNet(nn.Module):
    def __init__(self, in_ch=4, prop_time=24, crop_after=False):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        widths, blocks, strides = [64, 128, 256, 512], [3, 4, 6, 3], [1, 2, 2, 2]
        cin = 64
        self.layers = nn.ModuleList()
        for wd, nb, st in zip(widths, blocks, strides):
            stage = []
            for i in range(nb):
                stage.append(Bottleneck(cin, wd, st if i == 0 else 1))
                cin = wd * 4
            self.layers.append(nn.Sequential(*stage))
        self.bottleneck = nn.Sequential(
            nn.Conv2d(2048, 1024, 3, padding=1, bias=False),
            nn.BatchNorm2d(1024), nn.ReLU(inplace=True))
        self.up1 = UpProj(1024 + 1024, 512, crop_after)
        self.up2 = UpProj(512 + 512, 256, crop_after)
        self.up3 = UpProj(256 + 256, 128, crop_after)
        self.up4 = UpProj(128 + 64, 64, crop_after)
        self.up5 = UpProj(64, 64, crop_after)
        self.depth_head = nn.Conv2d(64, 1, 3, padding=1)
        self.guide_head = nn.Conv2d(64, 8, 3, padding=1)
        self.cspn = AffinityPropagate(prop_time)

    def forward(self, x):
        sparse = x[:, 3:4] if x.shape[1] == 4 else None
        hw = x.shape[2:]
        stem = F.relu(self.bn1(self.conv1(x)))
        y = F.max_pool2d(stem, 3, 2, 1)
        skips = []
        for stage in self.layers:
            y = stage(y)
            skips.append(y)
        c1, c2, c3, c4 = skips
        y = self.bottleneck(c4)
        y = self.up1(y, c3.shape[2:], c3)
        y = self.up2(y, c2.shape[2:], c2)
        y = self.up3(y, c1.shape[2:], c1)
        y = self.up4(y, stem.shape[2:], stem)
        y = self.up5(y, hw)
        blur = self.depth_head(y)
        guide = self.guide_head(y)
        return self.cspn(guide, blur, sparse)


def flax_to_torch_state_dict(params, batch_stats,
                             stage_sizes=(3, 4, 6, 3)):
    """Export CSPNDepthNet (flax) weights to a TorchCSPNNet state_dict.

    Inverse of models/torch_weights.py for the full network — used by the
    full-model parity test (the two implementations must be functionally
    identical nets) and to baseline trained weights in torch. The flax
    decoder holds separate up/skip kernels (models/unet.py handles the
    skip concat by linearity); torch's single concat-conv weight is their
    input-channel concatenation.
    """
    import numpy as np

    sd: dict[str, torch.Tensor] = {}

    def conv_w(k):  # flax (kH, kW, I, O) -> torch (O, I, kH, kW)
        return torch.from_numpy(
            np.transpose(np.asarray(k, np.float32), (3, 2, 0, 1)).copy())

    def vec(v):
        return torch.from_numpy(np.asarray(v, np.float32).copy())

    def put_bn(dst, p, s):
        sd[f"{dst}.weight"] = vec(p["scale"])
        sd[f"{dst}.bias"] = vec(p["bias"])
        sd[f"{dst}.running_mean"] = vec(s["mean"])
        sd[f"{dst}.running_var"] = vec(s["var"])

    enc, encs = params["encoder"], batch_stats["encoder"]
    sd["conv1.weight"] = conv_w(enc["conv1"]["kernel"])
    put_bn("bn1", enc["bn1"], encs["bn1"])
    for s, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            src, dst = f"layer{s + 1}_block{b}", f"layers.{s}.{b}"
            p, st = enc[src], encs[src]
            for i in (1, 2, 3):
                sd[f"{dst}.conv{i}.weight"] = conv_w(p[f"conv{i}"]["kernel"])
                put_bn(f"{dst}.bn{i}", p[f"bn{i}"], st[f"bn{i}"])
            if "conv_proj" in p:
                sd[f"{dst}.down.0.weight"] = conv_w(p["conv_proj"]["kernel"])
                put_bn(f"{dst}.down.1", p["bn_proj"], st["bn_proj"])

    dec, decs = params["decoder"], batch_stats["decoder"]
    sd["bottleneck.0.weight"] = conv_w(dec["bottleneck"]["kernel"])
    put_bn("bottleneck.1", dec["bottleneck_bn"], decs["bottleneck_bn"])
    for i in range(1, 6):
        p, st = dec[f"upproj{i}"], decs[f"upproj{i}"]
        k1, k2 = p["conv1a_up"], p["conv2_up"]
        if "conv1a_skip" in p:
            import numpy as _np
            k1 = _np.concatenate([k1, p["conv1a_skip"]], axis=2)
            k2 = _np.concatenate([k2, p["conv2_skip"]], axis=2)
        sd[f"up{i}.c1a.weight"] = conv_w(k1)
        sd[f"up{i}.c2.weight"] = conv_w(k2)
        sd[f"up{i}.c1b.weight"] = conv_w(p["conv1b"]["kernel"])
        put_bn(f"up{i}.b1a", p["bn1a"], st["bn1a"])
        put_bn(f"up{i}.b1b", p["bn1b"], st["bn1b"])
        put_bn(f"up{i}.b2", p["bn2"], st["bn2"])

    sd["depth_head.weight"] = conv_w(params["depth_head_kernel"])
    sd["depth_head.bias"] = vec(params["depth_head_bias"])
    sd["guide_head.weight"] = conv_w(params["guidance_head_kernel"])
    sd["guide_head.bias"] = vec(params["guidance_head_bias"])
    return sd


def main():
    torch.manual_seed(0)
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    h, w = 228, 304
    model = TorchCSPNNet(4, 24)
    x = torch.rand(batch, 4, h, w)
    target = torch.rand(batch, 1, h, w) * 10
    opt = torch.optim.SGD(model.parameters(), lr=0.01, momentum=0.9,
                          weight_decay=1e-4)

    def train_step():
        opt.zero_grad(set_to_none=True)
        pred = model(x)
        mask = (target > 0).float()
        loss = ((pred - target) ** 2 * mask).sum() / mask.sum().clamp_min(1)
        loss.backward()
        opt.step()
        return loss

    def infer_step():
        with torch.no_grad():
            return model(x)

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    train_step()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        train_step()
    t_train = (time.perf_counter() - t0) / iters

    model.eval()
    infer_step()
    t0 = time.perf_counter()
    for _ in range(iters):
        infer_step()
    t_infer = (time.perf_counter() - t0) / iters
    model.train()

    train_ips = batch / t_train
    infer_ips = batch / t_infer
    combined = 1 / (1 / train_ips + 1 / infer_ips)
    out = {
        "combined_ips": round(combined, 3),
        "train_images_per_sec": round(train_ips, 3),
        "infer_images_per_sec": round(infer_ips, 3),
        "batch": batch,
        "device": "cpu",
        "torch": torch.__version__,
        "note": ("reference-architecture PyTorch baseline measured on this "
                 "host's CPU (no GPU in the zero-egress environment; the "
                 "reference published no throughput numbers)"),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_BASELINE.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
