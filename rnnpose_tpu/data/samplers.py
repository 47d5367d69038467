"""Iteration-budget samplers with resume.

Re-design of the reference `utils/distributed_utils.py:117-314`:
  * `GivenIterationSampler`: a fixed total-iteration budget, seed-7
    permutation repeated to cover it, resumable by fast-forwarding
    `last_iter * batch_size` indices — exactly the reference's resume
    semantics (`DistributedGivenIterationSampler`, lines 178-260).
  * `SequentialShardSampler`: deterministic round-robin sharding for eval
    (`DistributedSequatialSampler`, lines 117-175).

'Rank/world' here are `shard_id/num_shards` — in single-controller JAX this
is usually (process_index, process_count) for multi-host input pipelines,
or (0, 1) on a single host since the batch itself is sharded over the mesh.
"""
from __future__ import annotations

from typing import Iterator, List

import numpy as np

__all__ = ["GivenIterationSampler", "GivenIterationSamplerEpoch", "SequentialShardSampler"]


class GivenIterationSampler:
    def __init__(
        self,
        dataset_size: int,
        total_iter: int,
        batch_size: int,
        shard_id: int = 0,
        num_shards: int = 1,
        last_iter: int = -1,
        seed: int = 7,
    ):
        self.dataset_size = dataset_size
        self.total_iter = total_iter
        self.batch_size = batch_size
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.last_iter = last_iter
        self.seed = seed
        self.total_size = total_iter * batch_size
        self.indices = self._gen_indices()

    def _gen_indices(self) -> np.ndarray:
        rs = np.random.RandomState(self.seed)
        need = self.total_size * self.num_shards
        reps = int(np.ceil(need / self.dataset_size))
        idx = np.concatenate(
            [rs.permutation(self.dataset_size) for _ in range(reps)]
        )[:need]
        # contiguous shard slice, like the reference's per-rank block split
        beg = self.total_size * self.shard_id
        return idx[beg : beg + self.total_size]

    def __iter__(self) -> Iterator[int]:
        start = (self.last_iter + 1) * self.batch_size
        return iter(self.indices[start:].tolist())

    def __len__(self) -> int:
        return self.total_size - (self.last_iter + 1) * self.batch_size


class GivenIterationSamplerEpoch(GivenIterationSampler):
    """Epoch variant: yields (index, epoch_seed) tuples so per-sample
    augmentation can be re-seeded per epoch (reference
    `DistributedGivenIterationSamplerEpoch`, `utils/distributed_utils.py:263-314`)."""

    def __iter__(self):
        start = (self.last_iter + 1) * self.batch_size
        for pos in range(start, self.total_size):
            epoch = (pos + self.total_size * self.shard_id) // max(
                self.dataset_size, 1
            )
            yield int(self.indices[pos]), self.seed + epoch


class SequentialShardSampler:
    """Round-robin eval sharding, no shuffle, padded to equal shard sizes."""

    def __init__(self, dataset_size: int, shard_id: int = 0, num_shards: int = 1):
        self.dataset_size = dataset_size
        self.shard_id = shard_id
        self.num_shards = num_shards

    def __iter__(self) -> Iterator[int]:
        return iter(range(self.shard_id, self.dataset_size, self.num_shards))

    def __len__(self) -> int:
        n, k, w = self.dataset_size, self.shard_id, self.num_shards
        return (n - k + w - 1) // w
