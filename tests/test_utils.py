"""Aux-subsystem tests: logging, colormaps, profiling, debug/checkify
(SURVEY.md section 6)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cspn_monodepth_tpu.utils.logging import (
    CSVLogger,
    colored_depthmap,
    merge_into_row,
    save_image,
)
from cspn_monodepth_tpu.utils.profiling import StepTimer, kernel_roofline
from cspn_monodepth_tpu.utils.debug import checkify_step


def test_csv_logger_roundtrip(tmp_path):
    path = str(tmp_path / "log.csv")
    log = CSVLogger(path, ["epoch", "rmse"])
    log.append({"epoch": 0, "rmse": 0.5, "ignored": 1})
    log.append({"epoch": 1, "rmse": 0.4})
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "epoch,rmse"
    assert lines[1] == "0,0.5" and lines[2] == "1,0.4"


def test_colored_depthmap_properties():
    depth = np.zeros((10, 10), np.float32)
    depth[5:, :] = np.linspace(1, 10, 10)[None, :].repeat(5, 0)
    img = colored_depthmap(depth)
    assert img.shape == (10, 10, 3) and img.dtype == np.uint8
    assert (img[:5] == 0).all()          # invalid pixels black
    assert img[5:].max() > 0             # valid pixels colored
    # near/far map to different colors
    assert not np.array_equal(img[5, 0], img[5, 9])


def test_merge_into_row_and_save(tmp_path):
    rng = np.random.default_rng(0)
    rgb = rng.random((8, 12, 3)).astype(np.float32)
    depth = rng.uniform(1, 9, (8, 12)).astype(np.float32)
    strip = merge_into_row(rgb, depth, depth, depth)
    assert strip.shape == (8, 12 * 4, 3)
    out = str(tmp_path / "panel.png")
    save_image(strip, out)
    assert os.path.getsize(out) > 0


def test_step_timer_discards_warmup():
    t = StepTimer(warmup=2)
    for _ in range(5):
        with t:
            pass
    assert len(t.times) == 3
    assert t.mean() >= 0.0


def test_kernel_roofline_estimate():
    r = kernel_roofline(8, 228, 304, device_kind="TPU v5 lite")
    assert r["bytes"] == 4 * 8 * 228 * 304 * 11
    assert 0 < r["sol_seconds"] < 1e-3


def test_checkify_catches_nan():
    def bad_step(x):
        return jnp.log(x)  # NaN for negative input

    checked = jax.jit(checkify_step(bad_step))
    err, out = checked(jnp.array([-1.0]))
    try:
        err.throw()
        raised = False
    except Exception:
        raised = True
    assert raised

    err, out = checked(jnp.array([1.0]))
    err.throw()  # no error


def test_profiler_trace_writes(tmp_path):
    from cspn_monodepth_tpu.utils.profiling import trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    found = []
    for root, _, files in os.walk(logdir):
        found += files
    assert found, "profiler produced no files"
