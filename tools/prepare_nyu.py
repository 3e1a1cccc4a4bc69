"""Pack the NYU-Depth-v2 h5 tree into flat memmap shards for fast reads.

The sparse-to-dense h5 distribution (SURVEY.md R7: one .h5 per frame with
`rgb` (3, 480, 640) uint8 and `depth` (480, 640) float32) costs a GIL-held
h5py open+decode per record — at the ~183 img/s one TPU chip consumes, the
47,584-file train split becomes an IO bottleneck on small hosts. This
script converts a split once into three flat files that
`PackedNYUDataset` (cspn_monodepth_tpu/data/datasets.py) memory-maps and
slices with zero parsing:

    <out>/<split>_rgb.u8     raw (N, 480, 640, 3) uint8
    <out>/<split>_depth.u16  raw (N, 480, 640) uint16, meters * 256
    <out>/<split>_index.json {"n": N, "height": 480, "width": 640,
                              "depth_scale": 256.0, "files": [...]}

Depth is stored at the 1/256 m resolution of the framework's wire format
(data/pipeline.py pack_batch) — training and eval already quantize to
exactly this grid before the data reaches the device, so packing is
lossless end-to-end.

Usage:
    python tools/prepare_nyu.py --src /data/nyudepthv2 --out /data/nyu_packed
    python tools/prepare_nyu.py --src ... --out ... --splits val
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

DEPTH_SCALE = 256.0


def list_h5(split_dir: str) -> list[str]:
    files = []
    for scene in sorted(os.listdir(split_dir)):
        p = os.path.join(split_dir, scene)
        if os.path.isdir(p):
            files += [os.path.join(p, f) for f in sorted(os.listdir(p))
                      if f.endswith(".h5")]
        elif scene.endswith(".h5"):
            files.append(p)
    return files


def pack_split(src: str, out: str, split: str) -> int:
    import h5py

    split_dir = os.path.join(src, split)
    files = list_h5(split_dir)
    if not files:
        print(f"[{split}] no .h5 files under {split_dir}, skipping")
        return 0
    os.makedirs(out, exist_ok=True)

    # probe shape from the first record
    with h5py.File(files[0], "r") as f:
        h, w = np.asarray(f["depth"]).shape

    n = len(files)
    rgb_mm = np.lib.format.open_memmap(
        os.path.join(out, f"{split}_rgb.u8.npy"), mode="w+",
        dtype=np.uint8, shape=(n, h, w, 3))
    dep_mm = np.lib.format.open_memmap(
        os.path.join(out, f"{split}_depth.u16.npy"), mode="w+",
        dtype=np.uint16, shape=(n, h, w))
    for i, path in enumerate(files):
        with h5py.File(path, "r") as f:
            rgb = np.asarray(f["rgb"])
            depth = np.asarray(f["depth"], np.float32)
        if rgb.ndim == 3 and rgb.shape[0] == 3:
            rgb = np.transpose(rgb, (1, 2, 0))
        rgb_mm[i] = rgb
        dep_mm[i] = np.clip(depth * DEPTH_SCALE + 0.5, 0, 65535).astype(
            np.uint16)
        if (i + 1) % 1000 == 0:
            print(f"[{split}] {i + 1}/{n}")
    rgb_mm.flush()
    dep_mm.flush()
    with open(os.path.join(out, f"{split}_index.json"), "w") as f:
        json.dump({"n": n, "height": int(h), "width": int(w),
                   "depth_scale": DEPTH_SCALE,
                   "files": [os.path.relpath(p, src) for p in files]}, f)
    print(f"[{split}] packed {n} records -> {out}")
    return n


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="h5 root ({train,val}/...)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    args = ap.parse_args(argv)
    total = 0
    for split in args.splits:
        total += pack_split(args.src, args.out, split)
    if total == 0:
        raise SystemExit(f"no records packed from {args.src}")


if __name__ == "__main__":
    main()
