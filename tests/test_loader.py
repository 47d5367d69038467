"""PrefetchLoader / prefetch_map: the host input pipeline (VERDICT r2 #4).

The loader must be a *semantics-preserving* speedup: identical batches to
the synchronous trainer loop (pull indices in order, skip degenerate
samples, group sequentially, drop the trailing partial batch), computed by
background threads.
"""
import threading
import time

import numpy as np
import pytest

from rnnpose_tpu.data.loader import PrefetchLoader, prefetch_map


class Skip(Exception):
    pass


def _fetch(idx):
    if idx % 7 == 3:  # degenerate frames
        raise Skip(idx)
    return {"idx": idx, "x": np.full((4,), idx, np.float32)}


def _collate(samples):
    return np.stack([s["x"] for s in samples])


def _sync_batches(indices, bs):
    out, cur = [], []
    for i in indices:
        try:
            cur.append(_fetch(i))
        except Skip:
            continue
        if len(cur) == bs:
            out.append(_collate(cur))
            cur = []
    return out  # trailing partial dropped


@pytest.mark.parametrize("num_threads", [1, 4])
def test_matches_synchronous_loop(num_threads):
    indices = list(range(53))
    bs = 4
    want = _sync_batches(indices, bs)
    with PrefetchLoader(indices, _fetch, bs, _collate,
                        num_threads=num_threads, skip_exc=Skip) as loader:
        got = list(loader)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_order_preserved_under_variable_latency():
    def slow_fetch(idx):
        time.sleep(0.02 if idx % 3 == 0 else 0.001)  # out-of-order completion
        return idx

    with PrefetchLoader(range(24), slow_fetch, 4, list,
                        num_threads=4, skip_exc=Skip) as loader:
        got = [i for b in loader for i in b]
    assert got == list(range(24))


def test_nonskip_exception_propagates():
    def bad_fetch(idx):
        if idx == 5:
            raise ValueError("boom")
        return idx

    loader = PrefetchLoader(range(10), bad_fetch, 2, list, skip_exc=Skip)
    with pytest.raises(ValueError, match="boom"):
        list(loader)


def test_collate_exception_propagates():
    def bad_collate(samples):
        raise RuntimeError("collate boom")

    loader = PrefetchLoader(range(4), _fetch, 2, bad_collate, skip_exc=Skip)
    with pytest.raises(RuntimeError, match="collate boom"):
        list(loader)


def test_close_releases_threads():
    before = threading.active_count()
    loader = PrefetchLoader(range(10_000), _fetch, 4, _collate,
                            num_threads=4, skip_exc=Skip)
    it = iter(loader)
    next(it)
    loader.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    # Feeder/collator exit on the stop event; pool threads are daemons whose
    # queued work is cancelled — no hang and no unbounded growth.
    assert threading.active_count() <= before + 8


def test_prefetches_ahead_of_consumer():
    """While the consumer sits on batch 0, workers should already be
    fetching ahead (the entire point of the loader)."""
    fetched = []
    lock = threading.Lock()

    def fetch(idx):
        with lock:
            fetched.append(idx)
        return idx

    with PrefetchLoader(range(64), fetch, 2, list,
                        num_threads=2, prefetch_batches=4) as loader:
        it = iter(loader)
        next(it)
        time.sleep(0.3)  # consumer stalls; prefetch keeps working
        with lock:
            n = len(fetched)
        assert n >= 8, f"only {n} samples prefetched while consumer stalled"


def test_prefetch_map_order_and_skip():
    def f(i):
        if i % 5 == 2:
            raise Skip(i)
        time.sleep(0.001 * (i % 3))
        return i * 10

    got = list(prefetch_map(range(20), f, num_threads=4, skip_exc=(Skip,)))
    want = [i * 10 for i in range(20) if i % 5 != 2]
    assert got == want


def test_prefetch_map_exception():
    def f(i):
        if i == 7:
            raise ValueError("x")
        return i

    with pytest.raises(ValueError):
        list(prefetch_map(range(10), f))
