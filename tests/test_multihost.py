"""Multi-host runtime test (SURVEY.md N6 / section 5.2 item 5).

Spawns 2 real OS processes that form a jax.distributed cluster on the CPU
backend (each contributing 4 virtual devices), builds the global
("data", "spatial") mesh, runs one DP training step of the tiny model with
per-host input shards, and checks that (a) both processes see the same
global loss and (b) it matches a single-process run on the same global
batch — i.e. gradient all-reduce + sync-BN + metric psums are correct
across process boundaries.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
nproc = int(sys.argv[2])
if nproc > 1:
    jax.distributed.initialize(coordinator_address="localhost:29512",
                               num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert jax.device_count() == 4 * nproc

import numpy as np
from cspn_monodepth_tpu.configs import get_config
from cspn_monodepth_tpu.train.loop import Trainer

cfg = get_config("synthetic_tiny").override(**{
    "mesh.data": 4 * nproc, "mesh.spatial": 1,
    "train.batch_size": 8, "data.height": 32, "data.width": 48,
    "data.num_samples": 20, "data.num_workers": 2,
    "train.steps_per_epoch": 2, "train.log_every": 100,
})
trainer = Trainer(cfg, workdir=f"/tmp/mh_{nproc}_{pid}")
state = trainer.init_state()
# The real per-host path: sharded iterator -> global arrays -> train step.
state, metrics = trainer.train_epoch(state, 0, log=lambda *a: None)

# Distributed eval equality (SURVEY.md section 5.2 item 5): run the full
# Trainer.evaluate under this process layout on a val set whose size does
# NOT divide the global batch (11 images, batch 8 -> the final batch is
# padded, one host's shard of it entirely padding) so the padded-batch +
# valid_image + psum'd per-image-sum path is exercised across processes.
trainer.val_ds.length = 11
ev = trainer.evaluate(state, log=lambda *a: None, save_panels=False)
print(json.dumps({"pid": pid, "loss": float(metrics["loss"]),
                  "count": float(metrics["n_valid_pixels"]),
                  "eval_rmse": float(ev["rmse"]),
                  "eval_delta1": float(ev["delta1"]),
                  "eval_mae": float(ev["mae"]),
                  "eval_n_images": float(ev["n_images"])}), flush=True)
"""


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ, "PYTHONPATH": "/root/repo:" + os.environ.get("PYTHONPATH", "")}

    # single-process reference (same global batch: pipeline sharding is
    # deterministic in (seed, epoch), independent of process layout)
    single = subprocess.run(
        [sys.executable, str(script), "0", "1"], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=420)
    assert single.returncode == 0, single.stderr[-2000:]
    ref = json.loads(single.stdout.strip().splitlines()[-1])

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2"], env=env,
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    losses = [o["loss"] for o in outs]
    # both processes agree on the global loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    # and it equals the single-process value on the same global batch
    np.testing.assert_allclose(losses[0], ref["loss"], rtol=1e-4)
    np.testing.assert_allclose(outs[0]["count"], ref["count"], rtol=1e-6)

    # distributed eval == single-process eval on the padded 11-image val
    # set (metrics psum'd across processes; exactly 11 images counted)
    assert outs[0]["eval_n_images"] == 11.0
    assert ref["eval_n_images"] == 11.0
    for k in ("eval_rmse", "eval_delta1", "eval_mae"):
        np.testing.assert_allclose(outs[0][k], outs[1][k], rtol=1e-6,
                                   err_msg=k)
        np.testing.assert_allclose(outs[0][k], ref[k], rtol=1e-4,
                                   err_msg=k)
