"""Background-prefetch batch loader.

Host-side input pipelining (≙ the reference's torch DataLoader worker pool,
fastvideo/distill_model.py:644-654): worker threads decode/preprocess ahead
of the training step so the accelerator never waits on video IO. Threads
(not processes) suffice here because decode/resize release the GIL in
OpenCV/the native library.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


class PrefetchLoader:
    """Prefetching index-driven loader with multi-host input sharding.

    On a multi-host mesh every process must consume DISJOINT samples (the
    reference shards per rank everywhere: DistributedSampler,
    fastvideo/distill_model.py:642-643; inference stride
    ``(step-1)*world_size+rank``, fastvideo/sample/sample.py:667). Here the
    global sample sequence is strided: process p draws indices
    ``p, p+P, p+2P, …`` (P = process_count), so the union over processes
    covers the stream with no overlap. Defaults read
    ``jax.process_index()/process_count()`` so a single-host run is the
    identity. The per-host batch then enters the mesh via
    ``jax.device_put(batch, NamedSharding(mesh, P("data", …)))`` —
    jax assembles the global array from each host's local shard.
    """

    def __init__(
        self,
        sample_fn: Callable[[int], Dict],
        batch_size: int = 1,
        *,
        num_workers: int = 2,
        prefetch: int = 4,
        collate: Optional[Callable[[List[Dict]], Dict]] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        assert 0 <= process_index < process_count, (process_index, process_count)
        self.sample_fn = sample_fn
        self.batch_size = batch_size
        self.process_index = process_index
        self.process_count = process_count
        self.collate = collate or _default_collate
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._idx = 0
        self._idx_lock = threading.Lock()
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_workers)
        ]
        for t in self._threads:
            t.start()

    def _next_indices(self) -> List[int]:
        with self._idx_lock:
            start = self._idx
            self._idx += self.batch_size
        # global stream position → this process's disjoint stride
        return [(start + j) * self.process_count + self.process_index
                for j in range(self.batch_size)]

    def _worker(self):
        while not self._stop.is_set():
            idx = self._next_indices()
            try:
                batch = self.collate([self.sample_fn(i) for i in idx])
            except Exception as e:  # surface errors on the consumer side
                batch = e
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict]:
        return self

    def __next__(self) -> Dict:
        item = self._q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=1.0)


def _default_collate(samples: List[Dict]) -> Dict:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out
