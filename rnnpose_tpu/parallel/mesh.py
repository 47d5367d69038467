"""Device mesh + sharding layout.

The reference's distribution layer is NCCL data-parallel: one process per
GPU, DDP gradient all-reduce, loss/metric all-reduce, distributed samplers
(`tools/train.py:239-240,336-342,441-453,557-571`,
`utils/distributed_utils.py`). The TPU-native equivalent (SURVEY.md §2.10)
is single-controller JAX SPMD: ONE process, a `jax.sharding.Mesh` over all
chips, batch sharded on a 'data' axis, parameters replicated; XLA inserts
the gradient psum. NCCL/mp.spawn/DDP machinery disappears entirely.

Multi-slice note: with a 2D ('replica', 'data') mesh the data axis rides
ICI within a slice and gradient reduction across slices rides DCN; for the
model sizes here (tens of MB of params) a 1D mesh is the right default.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate_params",
]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = "data",
) -> Mesh:
    """1D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, batch_size: int, axis_name: str = "data"):
    """Place a pytree batch: leaves with a leading `batch_size` dim are
    sharded on the data axis; everything else (per-class constants such as
    mesh vertices — the analog of the reference keeping renderer state per
    process) is replicated.

    Multi-process (`--multihost`): `batch_size` is the PER-PROCESS batch —
    each host loads only its sampler shard (reference per-rank DataLoader
    semantics, `utils/distributed_utils.py:239-260`) and the leaves are
    assembled into the global array with
    `jax.make_array_from_process_local_data` (global batch =
    batch_size x process_count). Non-batch leaves must be identical on
    every process (class constants / synthetic batches are, by
    construction: pure functions of seed+config).

    If the per-device batch does not come out whole, everything is
    replicated (single-chip / degenerate case).
    """
    n = mesh.devices.size
    n_proc = jax.process_count()
    ds = data_sharding(mesh, axis_name)
    rep = replicated(mesh)
    shardable = batch_size > 0 and (batch_size * n_proc) % n == 0

    def place(x):
        if (
            shardable
            and hasattr(x, "shape")
            and x.ndim >= 1
            and x.shape[0] == batch_size
        ):
            if n_proc > 1:
                return jax.make_array_from_process_local_data(
                    ds, np.asarray(x)
                )
            return jax.device_put(x, ds)
        return jax.device_put(np.asarray(x) if n_proc > 1 else x, rep)

    return jax.tree.map(place, batch)


def replicate_params(params, mesh: Mesh):
    """Replicate a pytree over the mesh. Multi-process: values must already
    be identical on every host (same-seed init / same checkpoint file);
    leaves go host->global via numpy so `device_put` accepts the
    cross-process sharding."""
    if jax.process_count() > 1:
        params = jax.tree.map(lambda x: np.asarray(x), params)
    return jax.device_put(params, replicated(mesh))
