"""Orbax checkpointing (SURVEY.md section 6 "Checkpoint/resume").

Reference behavior (section 3.4): save {epoch, args, model, optimizer,
best_result} per epoch, keep a "best" copy, `--resume` restores all of it.

TPU-native: orbax `CheckpointManager` with sharded async-capable saves of
the full TrainState + epoch + best metrics; restore honors the current mesh
by passing the target abstract tree. A `best` step pointer file replaces
the reference's model_best.pth.tar copy.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True),
        )

    def save(self, step: int, state, extra: dict[str, Any] | None = None,
             is_best: bool = False):
        """Save TrainState (+ small json extras: epoch, best metrics)."""
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            extra=ocp.args.JsonSave(extra or {}),
        )
        self._mgr.save(step, args=args)
        if is_best:
            # tiny pointer file, mirrors the reference's model_best copy
            with open(os.path.join(self.directory, "best_step.txt"), "w") as f:
                f.write(str(step))

    def restore(self, abstract_state, step: int | None = None):
        """Restore (state, extra) matching the current mesh/shardings.

        abstract_state: a pytree of jax.ShapeDtypeStruct (with shardings)
        shaped like the TrainState, e.g. from jax.eval_shape over init.
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                extra=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["extra"]

    def best_step(self) -> int | None:
        path = os.path.join(self.directory, "best_step.txt")
        if os.path.exists(path):
            with open(path) as f:
                return int(f.read().strip())
        return None

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def abstract_state_of(state):
    """ShapeDtypeStruct skeleton of a live state (for mesh-aware restore)."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x,
        state,
    )
