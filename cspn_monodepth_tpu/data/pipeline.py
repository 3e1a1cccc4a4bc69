"""Input pipeline: per-host sharded batching with threaded prefetch.

Replaces the reference's `torch.utils.data.DataLoader` worker pool
(SURVEY.md section 3.5). Design:

* Each host reads only its shard of the global batch
  (`process_index`-strided), so multi-host runs scale IO linearly.
* A thread pool decodes/augments records concurrently (h5/numpy release
  the GIL for the heavy parts) and batches are prefetched ahead of the
  training step so the TPU never waits on IO.
* Shuffling is a seeded per-epoch permutation — deterministic and
  resumable from (seed, epoch, step) alone, unlike torch's stateful
  sampler.
* Output batches are channels-last numpy: rgb (B, H, W, 3), depth
  (B, H, W). Sparse sampling happens later, on device.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from collections.abc import Iterator

import numpy as np


DEPTH_SCALE = 256.0  # uint16 depth wire format: 1/256 m resolution, 256 m max


def _stack(records: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    return {k: np.stack([r[k] for r in records]) for k in records[0]}


def pack_batch(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Compact wire format for host->device transfer: rgb as uint8, depth
    as uint16 (1/256 m, ~4 mm resolution) — 3.2x fewer bytes than float32.
    Decoded on device by Trainer._unpack inside the jit step. Matters on
    PCIe and enormously on tunneled transports."""
    out = dict(batch)
    if batch["rgb"].dtype != np.uint8:
        out["rgb"] = np.clip(batch["rgb"] * 255.0 + 0.5, 0, 255).astype(
            np.uint8)
    if batch["depth"].dtype != np.uint16:
        out["depth"] = np.clip(batch["depth"] * DEPTH_SCALE + 0.5, 0,
                               65535).astype(np.uint16)
    return out


class _PrefetchIterator:
    """Iterates batches with a bounded background prefetch queue.

    `start` skips the first batches by INDEX (no decode work): make_batch
    is an index-pure function, so mid-epoch resume replays the exact batch
    sequence of an uninterrupted run from any step."""

    def __init__(self, make_batch, num_batches: int, prefetch: int,
                 start: int = 0):
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._n = max(num_batches - start, 0)
        self._stop = threading.Event()

        def producer():
            for i in range(start, num_batches):
                if self._stop.is_set():
                    return
                try:
                    self._q.put(make_batch(i))
                except Exception as e:  # surface errors to the consumer
                    self._q.put(e)
                    return

        self._thread = threading.Thread(target=producer, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        for _ in range(self._n):
            item = self._q.get()
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stop.set()


def make_train_iterator(
    dataset,
    *,
    global_batch: int,
    epoch: int,
    seed: int = 0,
    num_workers: int = 8,
    steps: int = 0,
    start_step: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    prefetch: int = 4,
):
    """Yield this host's shard of each global batch for one epoch.

    Drops the final partial batch (static shapes under jit). `steps`
    overrides the epoch length if nonzero (e.g. tiny smoke runs).
    `start_step` resumes the deterministic batch sequence mid-epoch
    (checkpoint-restart, SURVEY.md section 6 failure row): the epoch's
    batches are a pure function of (seed, epoch, step), so starting at
    step N reproduces exactly what an uninterrupted run saw from step N.
    """
    n = len(dataset)
    assert global_batch % process_count == 0
    local_batch = global_batch // process_count
    num_batches = steps or max(n // global_batch, 1)

    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    perm = rng.permutation(max(n, global_batch)) % max(n, 1)
    pool = ThreadPoolExecutor(max_workers=num_workers)

    def make_batch(step: int) -> dict[str, np.ndarray]:
        base = (step * global_batch) % max(n, 1)
        idx = [perm[(base + process_index * local_batch + i) % len(perm)]
               for i in range(local_batch)]
        records = list(pool.map(lambda j: dataset.get(int(j), epoch), idx))
        return pack_batch(_stack(records))

    return _PrefetchIterator(make_batch, num_batches, prefetch,
                             start=start_step)


def device_prefetch(iterator, shardings: dict, depth: int = 2):
    """Asynchronously device_put batches `depth` steps ahead of use.

    jax.device_put is async (returns immediately; the copy proceeds in the
    background), so keeping `depth` batches in flight overlaps host->device
    transfer with the running step — the TPU never waits on PCIe/tunnel.
    `shardings` maps batch key -> NamedSharding (fallback key "*").
    """
    import collections

    import jax

    multihost = jax.process_count() > 1

    def put_one(v, sh):
        if multihost:
            # Each host holds its shard of the global batch; stitch them
            # into one global jax.Array (device_put cannot target
            # non-addressable shardings).
            return jax.make_array_from_process_local_data(sh, v)
        return jax.device_put(v, sh)

    def put(batch):
        return {
            k: put_one(v, shardings.get(k, shardings.get("*")))
            for k, v in batch.items()
        }

    buf = collections.deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def make_eval_iterator(
    dataset,
    *,
    global_batch: int,
    num_workers: int = 8,
    process_index: int = 0,
    process_count: int = 1,
    prefetch: int = 4,
):
    """Deterministic eval batches (padded final batch, with a `valid_image`
    mask so metrics ignore the padding)."""
    n = len(dataset)
    assert global_batch % process_count == 0
    local_batch = global_batch // process_count
    num_batches = -(-n // global_batch)
    pool = ThreadPoolExecutor(max_workers=num_workers)

    def make_batch(step: int) -> dict[str, np.ndarray]:
        records, valid = [], []
        for i in range(local_batch):
            j = step * global_batch + process_index * local_batch + i
            records.append(dataset.get(min(j, n - 1), epoch=0))
            valid.append(j < n)
        batch = _stack(records)
        # padding images get an all-invalid target => excluded from metrics
        v = np.asarray(valid, np.float32)
        batch["depth"] = batch["depth"] * v[:, None, None]
        batch = pack_batch(batch)
        batch["valid_image"] = v
        return batch

    return _PrefetchIterator(make_batch, num_batches, prefetch)
