"""Data pipeline tests (SURVEY.md R7-R10): dataset readers against
generated fixture files, transforms, and the batch iterator."""

import h5py
import os
import numpy as np
import pytest

from cspn_monodepth_tpu.configs import DataConfig
from cspn_monodepth_tpu.data.datasets import (
    KITTIDataset,
    NYUDataset,
    SyntheticDataset,
    make_dataset,
)
from cspn_monodepth_tpu.data.pipeline import make_eval_iterator, make_train_iterator
from cspn_monodepth_tpu.data.transforms import train_transform, val_transform


@pytest.fixture(scope="module")
def nyu_root(tmp_path_factory):
    """Generate a miniature NYU h5 tree: rgb (3,480,640) uint8 + depth."""
    root = tmp_path_factory.mktemp("nyu")
    rng = np.random.default_rng(0)
    for split, n in [("train", 3), ("val", 2)]:
        d = root / split / "scene1"
        d.mkdir(parents=True)
        for i in range(n):
            with h5py.File(d / f"{i:05d}.h5", "w") as f:
                f["rgb"] = rng.integers(0, 255, (3, 480, 640), np.uint8)
                f["depth"] = rng.uniform(0.5, 9.5, (480, 640)).astype(
                    np.float32)
    return str(root)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(1)
    for split, n in [("train", 3), ("val", 2)]:
        d = root / split
        d.mkdir(parents=True)
        for i in range(n):
            depth = np.zeros((375, 1242), np.float32)
            ys = rng.integers(150, 375, 2000)
            xs = rng.integers(0, 1242, 2000)
            depth[ys, xs] = rng.uniform(1, 80, 2000)
            np.savez(d / f"{i:05d}.npz",
                     rgb=rng.integers(0, 255, (375, 1242, 3), np.uint8),
                     depth=depth)
    return str(root)


def test_nyu_dataset_shapes(nyu_root):
    cfg = DataConfig(dataset="nyudepthv2", root=nyu_root)
    train = NYUDataset(cfg, "train")
    val = NYUDataset(cfg, "val")
    assert len(train) == 3 and len(val) == 2
    for ds in (train, val):
        rec = ds.get(0, epoch=0)
        assert rec["rgb"].shape == (228, 304, 3)
        assert rec["depth"].shape == (228, 304)
        assert rec["rgb"].dtype == np.float32
        assert 0.0 <= rec["rgb"].min() and rec["rgb"].max() <= 1.0
        assert rec["depth"].max() <= 15.0


def test_nyu_train_aug_is_deterministic_per_epoch(nyu_root):
    cfg = DataConfig(dataset="nyudepthv2", root=nyu_root)
    ds = NYUDataset(cfg, "train", seed=7)
    a = ds.get(1, epoch=3)
    b = ds.get(1, epoch=3)
    c = ds.get(1, epoch=4)
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    assert not np.array_equal(a["rgb"], c["rgb"])  # epoch changes aug


def test_kitti_dataset_shapes(kitti_root):
    cfg = DataConfig(dataset="kitti", root=kitti_root, height=352,
                     width=1216, max_depth=85.0)
    ds = KITTIDataset(cfg, "val")
    rec = ds.get(0, epoch=0)
    assert rec["rgb"].shape == (352, 1216, 3)
    assert rec["depth"].shape == (352, 1216)
    # bottom crop: sparse lidar density should be nonzero
    assert (rec["depth"] > 0).sum() > 100


def test_make_dataset_dispatch(nyu_root):
    assert isinstance(
        make_dataset(DataConfig(dataset="synthetic"), "train"),
        SyntheticDataset)
    assert isinstance(
        make_dataset(DataConfig(dataset="nyudepthv2", root=nyu_root), "val"),
        NYUDataset)
    with pytest.raises(ValueError):
        make_dataset(DataConfig(dataset="nope"), "train")


def test_train_transform_depth_scale_division():
    """Scaling by s divides depth by s (SURVEY.md section 4.4)."""
    rng = np.random.default_rng(3)
    rgb = np.full((100, 120, 3), 0.5, np.float32)
    depth = np.full((100, 120), 4.0, np.float32)
    out_rgb, out_depth = train_transform(
        rgb, depth, np.random.default_rng(5), out_h=50, out_w=60,
        rotate_deg=0.0, scale_max=1.5, hflip_prob=0.0, jitter=0.0)
    s_candidates = 4.0 / out_depth[out_depth > 0]
    s = float(np.median(s_candidates))
    assert 1.0 <= s <= 1.5 + 1e-6
    assert out_rgb.shape == (50, 60, 3)


def test_val_transform_deterministic():
    rng = np.random.default_rng(4)
    rgb = rng.random((100, 120, 3)).astype(np.float32)
    depth = rng.uniform(0.5, 9, (100, 120)).astype(np.float32)
    a = val_transform(rgb, depth, out_h=50, out_w=60)
    b = val_transform(rgb, depth, out_h=50, out_w=60)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_train_iterator_shards_across_processes():
    cfg = DataConfig(dataset="synthetic", height=16, width=24)
    ds = SyntheticDataset(cfg, "train", length=32)
    batches0 = list(make_train_iterator(
        ds, global_batch=8, epoch=0, steps=2, num_workers=2,
        process_index=0, process_count=2))
    batches1 = list(make_train_iterator(
        ds, global_batch=8, epoch=0, steps=2, num_workers=2,
        process_index=1, process_count=2))
    assert batches0[0]["rgb"].shape == (4, 16, 24, 3)  # local batch 8/2
    # hosts see disjoint halves of the global batch
    assert not np.array_equal(batches0[0]["rgb"], batches1[0]["rgb"])


def test_eval_iterator_pads_and_masks():
    cfg = DataConfig(dataset="synthetic", height=16, width=24)
    ds = SyntheticDataset(cfg, "val", length=5)
    batches = list(make_eval_iterator(ds, global_batch=4, num_workers=2))
    assert len(batches) == 2
    assert batches[1]["valid_image"].tolist() == [1.0, 0.0, 0.0, 0.0]
    # padded images have all-invalid depth => excluded from metric sums
    assert (batches[1]["depth"][1:] == 0).all()


def test_prepare_kitti_converter(tmp_path):
    """tools/prepare_kitti.py: raw pngs (uint16 depth/256 convention) ->
    npz layout consumed by KITTIDataset."""
    import sys
    sys.path.insert(0, "/root/repo")
    from PIL import Image
    from tools.prepare_kitti import convert, read_depth_png

    rng = np.random.default_rng(7)
    drive = "2011_09_26_drive_0001_sync"
    rgb_dir = tmp_path / "raw" / drive / "image_02" / "data"
    dep_dir = (tmp_path / "ann" / drive / "proj_depth" / "groundtruth"
               / "image_02")
    rgb_dir.mkdir(parents=True)
    dep_dir.mkdir(parents=True)
    h, w = 64, 128
    for i in range(3):
        rgb = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(rgb).save(rgb_dir / f"{i:010d}.png")
        if i < 2:  # frame 2 has no depth -> must be skipped
            d16 = np.zeros((h, w), np.uint16)
            d16[h // 2:, :] = (rng.uniform(1, 80, (h // 2, w)) * 256).astype(
                np.uint16)
            Image.fromarray(d16).save(dep_dir / f"{i:010d}.png")

    out = tmp_path / "npz"
    written, skipped = convert(str(tmp_path / "raw"), str(tmp_path / "ann"),
                               str(out), cameras=("image_02",))
    assert written == 2 and skipped == 1
    files = sorted(out.iterdir())
    data = np.load(files[0])
    assert data["rgb"].shape == (h, w, 3) and data["rgb"].dtype == np.uint8
    assert data["depth"].dtype == np.float32
    # uint16/256 round trip
    d = read_depth_png(str(dep_dir / "0000000000.png"))
    assert 0 < d.max() <= 80.01 and (d[: h // 2] == 0).all()

    # the produced npz set is loadable by KITTIDataset
    cfg = DataConfig(dataset="kitti", root=str(tmp_path / "kitti_ds"),
                     height=32, width=96, max_depth=85.0)
    split = tmp_path / "kitti_ds" / "val"
    split.mkdir(parents=True)
    for f in files:
        os.replace(f, split / f.name)
    import cspn_monodepth_tpu.data.datasets as D
    ds = D.KITTIDataset(cfg, "val")
    rec = ds.get(0)
    assert rec["rgb"].shape == (32, 96, 3)


def test_prepare_nyu_packed_roundtrip(nyu_root, tmp_path):
    """tools/prepare_nyu.py: h5 tree -> memmap shards; PackedNYUDataset
    records match NYUDataset records (rgb bitwise; depth to the uint16
    wire quantization the pipeline applies anyway)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from cspn_monodepth_tpu.data.datasets import PackedNYUDataset
    from tools.prepare_nyu import main as prepare_main

    out = str(tmp_path / "packed")
    prepare_main(["--src", nyu_root, "--out", out])

    cfg_h5 = DataConfig(dataset="nyudepthv2", root=nyu_root)
    cfg_pk = DataConfig(dataset="nyudepthv2", root=out)
    assert isinstance(make_dataset(cfg_pk, "train"), PackedNYUDataset)

    for split in ("train", "val"):
        a = make_dataset(cfg_h5, split, seed=3)
        b = make_dataset(cfg_pk, split, seed=3)
        assert len(a) == len(b)
        for i in range(len(a)):
            ra, rb = a.get(i, epoch=1), b.get(i, epoch=1)
            np.testing.assert_allclose(rb["rgb"], ra["rgb"], atol=1e-6)
            # source-side uint16 quantization: |err| <= (1/512)/s < 4 mm
            np.testing.assert_allclose(rb["depth"], ra["depth"], atol=4e-3)
            assert rb["rgb"].dtype == np.float32
