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
