"""Host-side prefetching data loader.

The reference leans on torch DataLoader worker processes for the CPU-heavy
preprocessing (`data/preprocess.py:913-929`). Single-controller JAX
equivalent: a thread pool maps dataset indices to samples, a collate stage
stacks class-homogeneous batches, and a bounded queue keeps N batches ahead
of the device so H2D transfer overlaps the train step.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, List, Optional

__all__ = ["PrefetchLoader"]


class PrefetchLoader:
    """Iterate `make_batch(idx_group)` results with background prefetch.

    Args:
      index_groups: iterable of index lists (one list per batch).
      make_batch: maps an index list to a device-ready batch; exceptions of
        type `skip_exc` make the loader fetch replacement indices from the
        iterator (the reference's skip-degenerate-sample path).
      num_threads: worker threads.
      prefetch: max queued batches.
    """

    def __init__(
        self,
        index_groups: Iterable[List[int]],
        make_batch: Callable[[List[int]], Any],
        num_threads: int = 2,
        prefetch: int = 4,
        skip_exc: type = Exception,
    ):
        self._groups = iter(index_groups)
        self._make = make_batch
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._skip = skip_exc
        self._done = object()
        self._lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_threads)
        ]
        self._stopped = False
        for t in self._threads:
            t.start()

    def _next_group(self):
        with self._lock:
            return next(self._groups, None)

    def _worker(self):
        while not self._stopped:
            group = self._next_group()
            if group is None:
                self._q.put(self._done)
                return
            try:
                batch = self._make(group)
            except self._skip:
                continue
            except Exception as e:  # surface other errors to the consumer
                self._q.put(e)
                return
            self._q.put(batch)

    def __iter__(self) -> Iterator[Any]:
        finished = 0
        while finished < len(self._threads):
            item = self._q.get()
            if item is self._done:
                finished += 1
                continue
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stopped = True
