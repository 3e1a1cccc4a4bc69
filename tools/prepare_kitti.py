"""Convert the KITTI depth-completion distribution to this repo's npz layout.

The official KITTI depth annotation ships uint16 PNGs where
depth_meters = png_value / 256 (0 = no lidar return), alongside the raw
camera PNGs. `KITTIDataset` (cspn_monodepth_tpu/data/datasets.py) consumes
one .npz per frame with keys `rgb` (H, W, 3) uint8 and `depth` (H, W)
float32 meters — this script produces that layout:

    python tools/prepare_kitti.py \
        --rgb-root  kitti_raw/          # .../<drive>/image_02/data/*.png
        --depth-root data_depth_annotated/train/   # .../proj_depth/groundtruth/image_02/*.png
        --out /data/kitti/train

Frames are matched by (drive, camera, frame-index); frames missing either
side are skipped (counted in the summary).
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def read_depth_png(path: str) -> np.ndarray:
    """KITTI uint16 depth png -> float32 meters (0 = invalid)."""
    from PIL import Image

    arr = np.asarray(Image.open(path), dtype=np.uint16)
    assert arr.ndim == 2, f"depth png must be single-channel: {path}"
    return arr.astype(np.float32) / 256.0


def read_rgb_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


_FRAME_RE = re.compile(r"(\d{10})\.png$")


def index_pngs(root: str, cam_dir: str) -> dict[tuple, str]:
    """Map (drive, camera, frame) -> path for every png under root whose
    path contains `cam_dir` (e.g. image_02)."""
    out = {}
    for dirpath, _, files in os.walk(root):
        if cam_dir not in dirpath:
            continue
        drive = next((p for p in dirpath.split(os.sep)
                      if "_drive_" in p), os.path.basename(dirpath))
        for f in files:
            m = _FRAME_RE.search(f)
            if m:
                out[(drive, cam_dir, m.group(1))] = os.path.join(dirpath, f)
    return out


def convert(rgb_root: str, depth_root: str, out_dir: str,
            cameras=("image_02", "image_03"), limit: int | None = None):
    os.makedirs(out_dir, exist_ok=True)
    written = skipped = 0
    for cam in cameras:
        rgbs = index_pngs(rgb_root, cam)
        depths = index_pngs(depth_root, cam)
        for key in sorted(rgbs):
            if limit is not None and written >= limit:
                break
            if key not in depths:
                skipped += 1
                continue
            rgb = read_rgb_png(rgbs[key])
            depth = read_depth_png(depths[key])
            if rgb.shape[:2] != depth.shape:
                skipped += 1
                continue
            drive, _, frame = key
            name = f"{drive}_{cam}_{frame}.npz"
            np.savez_compressed(os.path.join(out_dir, name),
                                rgb=rgb, depth=depth)
            written += 1
    return written, skipped


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rgb-root", required=True)
    p.add_argument("--depth-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--cameras", nargs="+", default=["image_02", "image_03"])
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()
    written, skipped = convert(args.rgb_root, args.depth_root, args.out,
                               cameras=tuple(args.cameras), limit=args.limit)
    print(f"wrote {written} frames to {args.out} ({skipped} skipped)")


if __name__ == "__main__":
    main()
