"""Datasets: NYU-Depth-v2 (h5), KITTI, and a synthetic set for tests.

Functional equivalents of the reference's `dataloaders/nyu_dataloader.py`,
`kitti_dataloader.py` (SURVEY.md R7/R8): random-access records returning
channels-last float32 (rgb [0,1], depth meters, 0 = invalid) after the
reference aug pipeline. Sparse sampling is NOT done here — it runs
on-device (ops/sparse.py).

Records are indexable (grain-compatible `__len__`/`__getitem__`); the
augmentation RNG is derived from (seed, epoch, index) so every record is
deterministic and reshardable across hosts.
"""

from __future__ import annotations

import os
from typing import Protocol

import numpy as np

from cspn_monodepth_tpu.configs import DataConfig
from cspn_monodepth_tpu.data.transforms import train_transform, val_transform


class DepthDataset(Protocol):
    def __len__(self) -> int: ...
    def get(self, index: int, epoch: int) -> dict[str, np.ndarray]: ...


class NYUDataset:
    """NYU-Depth-v2 from the sparse-to-dense h5 distribution.

    Layout: `<root>/{train,val}/<scene>/*.h5`, each file holding datasets
    `rgb` (3, 480, 640) uint8 and `depth` (480, 640) float32 meters
    (SURVEY.md R7). Train=47,584 files, val=654.

    Reference preprocessing: aug, then downsample to 240x320 and
    center-crop 304x228 (i.e. ~half scale).
    """

    RAW_HW = (480, 640)
    HALF_HW = (240, 320)

    def __init__(self, cfg: DataConfig, split: str, seed: int = 0):
        self.cfg = cfg
        self.split = split
        self.seed = seed
        split_dir = os.path.join(cfg.root, "train" if split == "train" else "val")
        self.files: list[str] = []
        if os.path.isdir(split_dir):
            for scene in sorted(os.listdir(split_dir)):
                scene_dir = os.path.join(split_dir, scene)
                if os.path.isdir(scene_dir):
                    self.files += [
                        os.path.join(scene_dir, f)
                        for f in sorted(os.listdir(scene_dir))
                        if f.endswith(".h5")
                    ]
                elif scene.endswith(".h5"):
                    self.files.append(scene_dir)

    def __len__(self) -> int:
        return len(self.files)

    def _read(self, path: str) -> tuple[np.ndarray, np.ndarray]:
        import h5py

        with h5py.File(path, "r") as f:
            rgb = np.asarray(f["rgb"])          # (3, H, W) uint8
            depth = np.asarray(f["depth"])      # (H, W) float
        if rgb.ndim == 3 and rgb.shape[0] == 3:
            rgb = np.transpose(rgb, (1, 2, 0))
        return rgb, depth

    def get(self, index: int, epoch: int = 0) -> dict[str, np.ndarray]:
        rgb, depth = self._read(self.files[index])
        c = self.cfg
        if self.split == "train":
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, index]))
            # Reference order: rotate/scale/flip/jitter at half scale, then
            # crop to (height, width). train_transform resizes to
            # s*(h, w) and center-crops, matching the half-scale pipeline
            # because (304, 228) * 2.105 == (640, 480).
            rgb, depth = train_transform(
                rgb, depth, rng, out_h=c.height, out_w=c.width,
                rotate_deg=c.rotate_deg, scale_max=c.scale_max,
                hflip_prob=c.hflip_prob, jitter=c.jitter, crop="center")
        else:
            # Deterministic eval: half-scale to 240x320, center-crop —
            # one fused affine resample (reference CenterCrop semantics).
            rgb, depth = val_transform(rgb, depth, out_h=c.height,
                                       out_w=c.width,
                                       resized_hw=self.HALF_HW, crop="center")
        return {"rgb": rgb.astype(np.float32),
                "depth": depth.astype(np.float32)}


class PackedNYUDataset:
    """NYU from the flat memmap shards written by `tools/prepare_nyu.py`
    (`<root>/{split}_rgb.u8.npy` + `{split}_depth.u16.npy` +
    `{split}_index.json`).

    Records are sliced straight out of page-cached memmaps — no h5py
    open/decode, no GIL-held parsing — so the reader keeps up with the
    native augmentation kernel. Depth is stored as uint16 meters*256,
    identical to the host->device wire format (pipeline.pack_batch), so
    packing loses nothing downstream. The uint8 rgb slice feeds the
    native kernel's u8 entry point directly (no float conversion of the
    full-resolution frame).
    """

    def __init__(self, cfg: DataConfig, split: str, seed: int = 0):
        import json

        self.cfg = cfg
        self.split = "train" if split == "train" else "val"
        self.seed = seed
        with open(os.path.join(cfg.root,
                               f"{self.split}_index.json")) as f:
            idx = json.load(f)
        self.n = idx["n"]
        self.depth_scale = float(idx.get("depth_scale", 256.0))
        self.rgb = np.load(os.path.join(cfg.root,
                                        f"{self.split}_rgb.u8.npy"),
                           mmap_mode="r")
        self.depth = np.load(os.path.join(cfg.root,
                                          f"{self.split}_depth.u16.npy"),
                             mmap_mode="r")
        self._half_hw = (idx["height"] // 2, idx["width"] // 2)

    def __len__(self) -> int:
        return self.n

    def get(self, index: int, epoch: int = 0) -> dict[str, np.ndarray]:
        rgb = np.ascontiguousarray(self.rgb[index])          # uint8 HWC
        depth = self.depth[index].astype(np.float32) / self.depth_scale
        c = self.cfg
        if self.split == "train":
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, index]))
            rgb, depth = train_transform(
                rgb, depth, rng, out_h=c.height, out_w=c.width,
                rotate_deg=c.rotate_deg, scale_max=c.scale_max,
                hflip_prob=c.hflip_prob, jitter=c.jitter, crop="center")
        else:
            rgb, depth = val_transform(rgb, depth, out_h=c.height,
                                       out_w=c.width,
                                       resized_hw=self._half_hw,
                                       crop="center")
        return {"rgb": rgb, "depth": depth}


def _is_packed_nyu(root: str) -> bool:
    return (os.path.isfile(os.path.join(root, "train_index.json"))
            or os.path.isfile(os.path.join(root, "val_index.json")))


class KITTIDataset:
    """KITTI depth: bottom-crop 1216x352, lidar-projected sparse GT
    (SURVEY.md R8). Expects `<root>/{train,val}/*.npz` with keys `rgb`
    (H, W, 3) uint8 and `depth` (H, W) float meters (0 = no lidar return),
    pre-exported from the raw KITTI distribution.
    """

    def __init__(self, cfg: DataConfig, split: str, seed: int = 0):
        self.cfg = cfg
        self.split = split
        self.seed = seed
        split_dir = os.path.join(cfg.root, "train" if split == "train" else "val")
        self.files = []
        if os.path.isdir(split_dir):
            self.files = [
                os.path.join(split_dir, f)
                for f in sorted(os.listdir(split_dir))
                if f.endswith(".npz")
            ]

    def __len__(self) -> int:
        return len(self.files)

    def get(self, index: int, epoch: int = 0) -> dict[str, np.ndarray]:
        data = np.load(self.files[index])
        rgb = np.asarray(data["rgb"], np.float32)
        depth = np.asarray(data["depth"], np.float32)
        c = self.cfg
        if self.split == "train":
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, index]))
            # KITTI aug: hflip + jitter only (no rotate/scale), bottom crop.
            rgb, depth = train_transform(
                rgb, depth, rng, out_h=c.height, out_w=c.width,
                rotate_deg=0.0, scale_max=1.0, hflip_prob=c.hflip_prob,
                jitter=c.jitter, crop="bottom")
        else:
            rgb, depth = val_transform(rgb, depth, out_h=c.height,
                                       out_w=c.width, crop="bottom")
        return {"rgb": rgb.astype(np.float32),
                "depth": depth.astype(np.float32)}


class SyntheticDataset:
    """Procedural RGB-D for tests and benchmarks: random smooth depth
    surfaces plus a shaded rendering, so training has learnable signal.
    """

    def __init__(self, cfg: DataConfig, split: str, seed: int = 0,
                 length: int = 64):
        self.cfg = cfg
        self.split = split
        self.seed = seed if split == "train" else seed + 10_000
        self.length = length
        self._cache: dict[int, dict[str, np.ndarray]] = {}

    def __len__(self) -> int:
        return self.length

    def get(self, index: int, epoch: int = 0) -> dict[str, np.ndarray]:
        # Records are deterministic in (seed, index) — cache them so
        # synthetic benchmarks/demos aren't bound by numpy generation.
        cached = self._cache.get(index)
        if cached is not None:
            return cached
        rec = self._generate(index)
        if len(self._cache) < 4096:
            self._cache[index] = rec
        return rec

    def _generate(self, index: int) -> dict[str, np.ndarray]:
        c = self.cfg
        h, w = c.height, c.width
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, index]))
        yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                             indexing="ij")
        depth = np.full((h, w), 2.0, np.float32)
        for _ in range(4):  # random slanted planes (depth discontinuities)
            cy, cx = rng.uniform(0.2, 0.8, 2)
            ry, rx = rng.uniform(0.1, 0.4, 2)
            plane = (rng.uniform(1, 8)
                     + rng.uniform(-2, 2) * yy + rng.uniform(-2, 2) * xx)
            box = (np.abs(yy - cy) < ry) & (np.abs(xx - cx) < rx)
            depth = np.where(box, plane.astype(np.float32), depth)
        depth = np.clip(depth, 0.5, c.max_depth).astype(np.float32)
        # Shading: rgb encodes depth gradients + noise => learnable.
        gy, gx = np.gradient(depth)
        rgb = np.stack([
            0.5 + 0.5 * np.tanh(4 * gy),
            0.5 + 0.5 * np.tanh(4 * gx),
            depth / c.max_depth,
        ], axis=-1).astype(np.float32)
        rgb += rng.normal(0, 0.02, rgb.shape).astype(np.float32)
        return {"rgb": np.clip(rgb, 0, 1), "depth": depth}


def make_dataset(cfg: DataConfig, split: str, seed: int = 0):
    if cfg.dataset == "nyudepthv2":
        if _is_packed_nyu(cfg.root):
            return PackedNYUDataset(cfg, split, seed)
        return NYUDataset(cfg, split, seed)
    if cfg.dataset == "kitti":
        return KITTIDataset(cfg, split, seed)
    if cfg.dataset == "synthetic":
        return SyntheticDataset(cfg, split, seed)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")
