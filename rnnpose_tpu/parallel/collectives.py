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

import json
from typing import Dict, List

import jax
import numpy as np

__all__ = ["weighted_reduce_metrics"]

# Fixed buffer for the cross-process key-set agreement round: key lists are
# JSON-encoded and zero-padded to this many bytes so every host contributes
# an identically-shaped array to the collective.
_KEYSET_BYTES = 8192


def _agree_key_set(keys) -> List[str]:
    """Union of every process's metric-key set.

    `process_allgather` gathers leaf-wise and requires the same pytree (and
    leaf shapes) on every host, but per-host key sets can genuinely differ:
    a host with zero eval frames has no summaries at all, and under
    `--evaluator auto` different hosts can draw different evaluator classes
    (LINEMOD vs YCB metric sets). Agreeing on the union first keeps the
    numeric gather below structurally identical everywhere.
    """
    from jax.experimental import multihost_utils

    payload = json.dumps(sorted(keys)).encode()
    if len(payload) > _KEYSET_BYTES:
        raise ValueError(
            f"metric key set too large to agree on ({len(payload)} bytes)"
        )
    buf = np.zeros(_KEYSET_BYTES, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    agreed = set()
    for row in gathered:
        raw = row.tobytes().rstrip(b"\x00")
        if raw:
            agreed.update(json.loads(raw.decode()))
    return sorted(agreed)


def _local_sums(summaries, keys, weight_key):
    """Per-key (weighted sum, weight) over this host's summaries.

    Weights are PER KEY — a summary only contributes its seq_len to the
    keys it actually carries — so mixed evaluator classes (or a host with
    zero frames) do not drag down metrics they never measured.
    """
    sums = {}
    ws = {}
    for k in keys:
        sums[k] = float(
            sum(s[k] * s.get(weight_key, 0) for s in summaries if k in s)
        )
        ws[k] = float(
            sum(s.get(weight_key, 0) for s in summaries if k in s)
        )
    total = float(sum(s.get(weight_key, 0) for s in summaries))
    return sums, ws, total


def weighted_reduce_metrics(
    summaries: List[Dict[str, float]], weight_key: str = "seq_len"
) -> Dict[str, float]:
    """seq_len-weighted mean of per-shard metric summaries.

    Replicates the reference's weighted all_gather reduction
    (`tools/train.py:724-741`): each entry is one shard's `summarize()`
    output; the result weights every metric by the sequence length of the
    summaries that carry it.
    """
    local_keys = {k for s in summaries for k in s if k != weight_key}

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        keys = _agree_key_set(local_keys)
        sums, ws, total = _local_sums(summaries, keys, weight_key)
        # One fixed-key numeric pytree per host -> (nproc,)-leaf gather.
        gathered = multihost_utils.process_allgather(
            {"sums": sums, "ws": ws, weight_key: total}
        )
        out = {}
        for k in keys:
            w = float(np.sum(gathered["ws"][k]))
            if w > 0:
                out[k] = float(np.sum(gathered["sums"][k])) / w
        out[weight_key] = float(np.sum(gathered[weight_key]))
        return out

    sums, ws, total = _local_sums(summaries, sorted(local_keys), weight_key)
    out = {k: sums[k] / ws[k] for k in sums if ws[k] > 0}
    out[weight_key] = total
    return out
