"""Tracing/profiling (SURVEY.md section 6 "Tracing/profiling").

The reference only had wall-clock data_time/gpu_time fields; here:

* `trace(logdir)`: jax.profiler context — view in XProf / TensorBoard
  (tensorboard-plugin-profile is installed). Captures XLA HLO + TPU
  per-kernel timelines including the Pallas CSPN kernel.
* `StepTimer`: block_until_ready-bracketed wall-clock timer with warmup
  discard, for honest steady-state step timings.
* `kernel_roofline`: analytic speed-of-light estimate for the CSPN kernel
  (memory-bound: bytes / HBM bandwidth) to compare measured times against.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates steady-state step times, discarding warmup steps."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._n = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def marginal_chain(fn, carry, params=None, n=10, reps=2, max_retries=3):
    """Marginal per-step seconds of a `carry, params -> carry` function.

    Canonical implementation of the serial-chain methodology every bench
    tool shares (bench.py docstring): two chains of n and 5n serially-
    dependent steps each run as one lax.scan under a single jit, the clock
    closed by a scalar readback; per-step time is (t_5n - t_n) / (4n).
    The tunneled PJRT transport adds a large run-varying fixed dispatch
    latency (5-25 ms measured), which differencing cancels in expectation —
    with min-of-`reps` per chain the residual error is bounded by the
    latency spread, so a non-positive difference is treated as a
    MEASUREMENT FAILURE: retried with more repetitions, then raised —
    never silently clamped (a clamp would print absurd throughput).

    Returns (step_seconds, dispatch_seconds).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make(length):
        @jax.jit
        def chained(c, p):
            def body(c, _):
                return fn(c, p), None
            c, _ = lax.scan(body, c, None, length=length)
            return c
        return chained

    short, long_ = make(n), make(5 * n)

    def run(chained, r):
        out = chained(carry, params)        # warm (compile on first call)
        _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1]))
        best = float("inf")
        for _i in range(r):
            t0 = time.perf_counter()
            out = chained(carry, params)
            _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1]))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = t_long = 0.0
    for _attempt in range(max_retries):
        t_short, t_long = run(short, reps), run(long_, reps)
        if t_long > t_short:
            step = (t_long - t_short) / (4 * n)
            return step, max(t_short - n * step, 0.0)
        reps += 2
    raise RuntimeError(
        f"marginal-chain timing failed: t_5n={t_long:.4f}s <= "
        f"t_n={t_short:.4f}s after {max_retries} attempts - dispatch "
        f"latency noise exceeds the chain signal; increase n")


# TPU v5e (lite) HBM bandwidth ~ 819 GB/s; v4 ~ 1228 GB/s. Used only for
# roofline *estimates* printed next to measurements.
HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v5p": 2765.0}


def kernel_roofline(batch: int, h: int, w: int, device_kind: str | None = None
                    ) -> dict[str, float]:
    """Speed-of-light for the fused CSPN kernel: HBM traffic is one read of
    guidance (8 planes) + blur + sparse and one write of the output,
    independent of the iteration count (everything else stays in VMEM)."""
    if device_kind is None:
        device_kind = jax.devices()[0].device_kind
    gbps = next((v for k, v in HBM_GBPS.items()
                 if k in device_kind.lower()), 819.0)
    bytes_total = 4.0 * batch * h * w * (8 + 1 + 1 + 1)
    return {
        "bytes": bytes_total,
        "hbm_gbps": gbps,
        "sol_seconds": bytes_total / (gbps * 1e9),
    }
