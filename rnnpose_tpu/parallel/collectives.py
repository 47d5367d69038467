"""Distributed metric reduction.

The reference all-gathers seq_len-weighted metric sums across ranks at eval
(`tools/train.py:724-741`) and all-reduces loss scalars during training
(`tools/train.py:557-561`). Single-controller JAX equivalents:

  * inside jit/SPMD: metrics computed from sharded batches are already
    globally correct (XLA inserts the psum);
  * across *processes* (multi-host): `weighted_reduce_metrics` uses
    `jax.experimental.multihost_utils.process_allgather`;
  * single-host: a plain weighted average.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np

__all__ = ["weighted_reduce_metrics"]


def weighted_reduce_metrics(
    summaries: List[Dict[str, float]], weight_key: str = "seq_len"
) -> Dict[str, float]:
    """seq_len-weighted mean of per-shard metric summaries.

    Replicates the reference's weighted all_gather reduction
    (`tools/train.py:724-741`): each entry is one shard's `summarize()`
    output; the result weights every metric by that shard's sequence length.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # `process_allgather` gathers LEAF-wise and needs the same pytree
        # on every host; per-host summary COUNTS differ (frames are
        # class/process-strided), so gathering the raw list would be a
        # pytree mismatch. Reduce locally to ONE fixed-key dict of weighted
        # sums first, gather that ((nproc,) leaves), then finish globally.
        # Requires every host to see the same metric KEY set — true for
        # the evaluators (fixed key set per evaluator class); a host with
        # zero frames must still call this with an all-zero summary.
        local_w = float(sum(s.get(weight_key, 0) for s in summaries))
        keys = sorted({k for s in summaries for k in s if k != weight_key})
        local = {
            k: float(
                sum(s.get(k, 0.0) * s.get(weight_key, 0) for s in summaries)
            )
            for k in keys
        }
        local[weight_key] = local_w
        gathered = multihost_utils.process_allgather(local)
        total_w = float(np.sum(gathered[weight_key]))
        if total_w == 0:
            return {weight_key: 0}
        out = {
            k: float(np.sum(v)) / total_w
            for k, v in gathered.items()
            if k != weight_key
        }
        out[weight_key] = total_w
        return out

    total_w = sum(s.get(weight_key, 0) for s in summaries)
    if total_w == 0:
        return {weight_key: 0}
    keys = {k for s in summaries for k in s if k != weight_key}
    out = {
        k: sum(s.get(k, 0.0) * s.get(weight_key, 0) for s in summaries) / total_w
        for k in keys
    }
    out[weight_key] = total_w
    return out
