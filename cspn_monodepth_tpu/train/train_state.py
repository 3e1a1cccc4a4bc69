"""Train state + optimizer + LR schedule (SURVEY.md R2 / section 4.6).

Reference recipe: SGD momentum 0.9, base lr 0.01, weight decay 1e-4, lr
x0.2 every ~5 epochs. Implemented with optax; the schedule is a function of
the global step so it is fully resumable from the checkpointed step alone.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import optax

from cspn_monodepth_tpu.configs import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    def apply_gradients(self, tx, grads, new_batch_stats):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        return TrainState(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Step decay: lr * rate^(epoch // decay_every)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return cfg.lr * (cfg.lr_decay_rate ** (epoch // cfg.lr_decay_every))

    return schedule


def _encoder_mask(params):
    """True for every leaf under the top-level "encoder" subtree."""
    return {k: jax.tree.map(lambda _: k == "encoder", v)
            for k, v in params.items()}


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    clip = ([optax.clip_by_global_norm(cfg.clip_norm)]
            if getattr(cfg, "clip_norm", 0.0) > 0 else [])
    if cfg.optimizer == "sgd":
        tx = optax.chain(
            *clip,
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.momentum),
        )
    elif cfg.optimizer == "adam":
        tx = optax.chain(
            *clip,
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(schedule),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    # Reference recipe (SURVEY.md section 4.6): pretrained (encoder) layers
    # at a fraction of the base lr. Scaling the final update by the
    # multiplier == running that group at lr * mult (SGD applies lr last).
    mult = getattr(cfg, "encoder_lr_mult", 1.0)
    if mult != 1.0:
        tx = optax.chain(tx, optax.masked(optax.scale(mult), _encoder_mask))
    return tx, schedule


def create_train_state(variables, tx) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
