"""Debug mode (SURVEY.md section 6 "Race detection/sanitizers").

Races/sanitizers are N/A under XLA's functional model; the debug
equivalents here are NaN trapping + deterministic replay:

* `enable_debug()`: turn on jax_debug_nans (jit re-runs op-by-op on NaN and
  raises at the producing op) and disable_most_optimizations for clearer
  HLO mapping.
* `checkify_step(fn)`: wrap a jitted step with jax.experimental.checkify
  NaN/div-by-zero checks that survive jit — use when debug_nans' eager
  replay is too slow.
* Determinism: all randomness in the framework flows from (seed, epoch,
  step/index)-derived keys (data pipeline + device-side sampling), so any
  step is exactly replayable by re-running with the same config.
"""

from __future__ import annotations

import jax
from jax.experimental import checkify


def enable_debug(nans: bool = True, disable_opts: bool = False):
    if nans:
        jax.config.update("jax_debug_nans", True)
    if disable_opts:
        jax.config.update("jax_disable_most_optimizations", True)


def checkify_step(fn):
    """Return a wrapped step that raises on NaN/inf/div0 under jit.

    Usage:
        checked = checkify_step(trainer.train_step)
        err, out = checked(state, batch, rng); err.throw()
    """
    return checkify.checkify(
        fn, errors=checkify.float_checks | checkify.div_checks)
