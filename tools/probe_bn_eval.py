"""Measure the eval-path headroom of conv+BN folding (round-4 verdict
item: "fused conv+BN epilogue on the eval path").

At eval, BatchNorm is a per-channel affine y = x*a + b with a, b derived
from running stats — folding it into the adjacent conv's weights can at
BEST remove that elementwise pass. This probe times the REAL eval chain
(bench.py methodology) twice: stock, and with every BatchNorm /
PackedBatchNorm patched to identity at apply time. The difference is a
strict UPPER BOUND on any folding win (folding can never beat removing
the op entirely, and identity-BN also deletes the affine's operands from
VMEM/registers). Numerics are wrong under the patch — only the timing is
meaningful.

Run (TPU, solo client, background):
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu python tools/probe_bn_eval.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cspn_monodepth_tpu.configs import get_config
from cspn_monodepth_tpu.train.loop import Trainer
from cspn_monodepth_tpu.utils.profiling import marginal_chain

batch = int(os.environ.get("BENCH_BATCH", "32"))

cfg = get_config("nyu_completion_500").override(**{
    "data.dataset": "synthetic",
    "train.batch_size": batch,
    "train.steps_per_epoch": 1,
    "mesh.data": 1, "mesh.spatial": 1,
})
trainer = Trainer(cfg, workdir="/tmp/cspn_probe_bn")
state = trainer.init_state()

h, w = cfg.data.height, cfg.data.width
rng_np = np.random.default_rng(0)
dev_batch = {
    "rgb": jax.device_put(
        rng_np.random((batch, h, w, 3), dtype="float32"), trainer._bsh),
    "depth": jax.device_put(
        rng_np.uniform(0.5, 9.5, (batch, h, w)).astype("float32"),
        trainer._bsh),
    "valid_image": jax.device_put(np.ones(batch, "float32"),
                                  trainer._bsh1d),
}
rng = jax.device_put(jax.random.key(0), trainer._rep)


def time_infer(label):
    # state/batch/rng MUST flow through marginal_chain's params argument:
    # closed-over arrays are embedded in the HLO as literals, and the
    # tunnel's remote-compile endpoint rejects bodies >~100 MB (verify
    # skill gotchas — the 115M-param state is 460 MB of literals).
    def step(carry, p):
        st, b, r = p
        acc, i = carry
        sums, pred = trainer.eval_step_fn(st, b, r, i)
        consumed = sum(jnp.sum(x) for x in jax.tree.leaves(sums)) * 1e-12
        return (acc + jnp.mean(pred) * 1e-9 + consumed, i + 1)

    # acc is (1,) — marginal_chain's scalar readback slices the first
    # carry leaf and needs at least one dimension.
    t, _ = marginal_chain(step, (jnp.zeros((1,), jnp.float32),
                                 jnp.int32(0)),
                          (state, dev_batch, rng), n=10)
    print(json.dumps({"variant": label, "eval_step_ms": round(t * 1e3, 3),
                      "images_per_sec": round(batch / t, 1)}), flush=True)
    return t


t_stock = time_infer("stock")

# Patch BOTH BN flavors to identity; tracing happens lazily at the first
# chain call, so patching here affects the second measurement only.
import flax.linen as nn  # noqa: E402

from cspn_monodepth_tpu.models import unet  # noqa: E402

nn.BatchNorm.__call__ = lambda self, x, use_running_average=None, mask=None: x
unet.PackedBatchNorm.__call__ = lambda self, x, train: x

t_identity = time_infer("identity_bn")

print(json.dumps({
    "bn_eval_cost_ms": round((t_stock - t_identity) * 1e3, 3),
    "fold_headroom_pct": round(100 * (t_stock - t_identity) / t_stock, 2),
    "note": "upper bound on any conv+BN folding win at eval",
}))
