"""Host-side prefetching data loader.

The reference overlaps host preprocessing with device compute via torch
DataLoader worker processes (`data/preprocess.py:913-929`). The
single-controller JAX equivalent here is a thread pipeline:

  * a feeder walks the (seeded, resumable) index sampler in order and
    submits `fetch(idx)` calls to a thread pool — the per-sample work
    (image decode, KD-tree correspondences, KPConv pyramid via the ctypes
    C++ ops) is numpy/scipy/C++-heavy and releases the GIL, so threads
    genuinely overlap;
  * a collator consumes the futures IN SUBMISSION ORDER, drops samples
    that raise `skip_exc` (the reference's skip-degenerate-frame path,
    `data/linemod_dataset.py:421-437`), groups `batch_size` survivors,
    runs `collate` off the main thread, and parks finished batches in a
    bounded queue.

Order preservation makes the produced batches IDENTICAL to the synchronous
loop (pull indices in order, skip degenerates, group sequentially), so
wiring this in changes throughput, not training semantics — determinism
(SURVEY.md §5.2) is preserved.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, List

__all__ = ["PrefetchLoader", "prefetch_map"]

_DONE = object()


def prefetch_map(
    items: Iterable[Any],
    fn: Callable[[Any], Any],
    num_threads: int = 4,
    depth: int = 8,
    skip_exc: tuple = (),
) -> Iterator[Any]:
    """Yield `fn(item)` in input order, computed by a background thread pool.

    Order-preserving map with bounded lookahead — the eval-path analog of
    `PrefetchLoader` (no batching; the caller does its own per-class
    grouping). Items raising `skip_exc` are dropped.
    """
    from collections import deque

    pool = ThreadPoolExecutor(max_workers=num_threads, thread_name_prefix="pfmap")
    try:
        it = iter(items)
        futs: "deque" = deque()

        def fill():
            while len(futs) < depth:
                try:
                    x = next(it)
                except StopIteration:
                    return
                futs.append(pool.submit(fn, x))

        fill()
        while futs:
            f = futs.popleft()
            fill()
            try:
                res = f.result()
            except skip_exc:
                continue
            yield res
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


class PrefetchLoader:
    """Iterate collated batches with background prefetch.

    Args:
      indices: iterable of dataset indices (e.g. a GivenIterationSampler).
      fetch: maps one index to one sample (may raise `skip_exc` to drop it).
      batch_size: samples per collated batch; a trailing partial batch is
        dropped (same as the synchronous trainer loop).
      collate: maps a list of `batch_size` samples to a device-ready batch.
      num_threads: fetch worker threads.
      prefetch_batches: max finished batches parked ahead of the consumer.
      skip_exc: exception type marking a degenerate sample to skip.
    """

    def __init__(
        self,
        indices: Iterable[int],
        fetch: Callable[[int], Any],
        batch_size: int,
        collate: Callable[[List[Any]], Any],
        num_threads: int = 4,
        prefetch_batches: int = 2,
        skip_exc: type = Exception,
    ):
        assert batch_size >= 1 and num_threads >= 1 and prefetch_batches >= 1
        self._fetch = fetch
        self._bs = batch_size
        self._collate = collate
        self._skip = skip_exc
        self._stop = threading.Event()
        self._pool = ThreadPoolExecutor(
            max_workers=num_threads, thread_name_prefix="prefetch"
        )
        # In-submission-order future queue; its bound is what limits the
        # number of outstanding fetches (pool queue itself is unbounded).
        depth = max(prefetch_batches * batch_size, num_threads)
        self._futs: "queue.Queue" = queue.Queue(maxsize=depth)
        self._out: "queue.Queue" = queue.Queue(maxsize=prefetch_batches)
        self._feeder = threading.Thread(
            target=self._feed, args=(iter(indices),), daemon=True
        )
        self._collator = threading.Thread(target=self._run_collate, daemon=True)
        self._feeder.start()
        self._collator.start()

    # -- producer side -----------------------------------------------------

    def _put(self, q: "queue.Queue", item) -> bool:
        """Bounded put that aborts on close() instead of deadlocking."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _feed(self, it: Iterator[int]):
        try:
            for idx in it:
                if not self._put(self._futs, self._pool.submit(self._fetch, idx)):
                    return
        except Exception as e:  # sampler error -> surface to the consumer
            self._put(self._futs, e)
            return
        self._put(self._futs, _DONE)

    def _run_collate(self):
        samples: List[Any] = []
        while not self._stop.is_set():
            try:
                fut = self._futs.get(timeout=0.1)
            except queue.Empty:
                continue
            if fut is _DONE:
                break  # trailing partial batch dropped, like the sync loop
            if isinstance(fut, Exception):
                self._put(self._out, fut)
                return
            try:
                samples.append(fut.result())
            except self._skip:
                continue
            except Exception as e:
                self._put(self._out, e)
                return
            if len(samples) == self._bs:
                try:
                    batch = self._collate(samples)
                except Exception as e:
                    self._put(self._out, e)
                    return
                samples = []
                if not self._put(self._out, batch):
                    return
        self._put(self._out, _DONE)

    # -- consumer side ------------------------------------------------------

    def __iter__(self) -> Iterator[Any]:
        while True:
            item = self._out.get()
            if item is _DONE:
                return
            if isinstance(item, Exception):
                self.close()
                raise item
            yield item

    def close(self):
        """Stop the pipeline and release the worker threads."""
        self._stop.set()
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
