"""Host-side KPConv input-pyramid construction.

The reference builds the multi-resolution pyramid in the dataloader worker
with C++ extensions (`data/preprocess.py:503-561,707-853`: grid subsampling
via `cpp_subsampling`, radius neighbors via `cpp_neighbors`/nanoflann,
shadow index = N). This module provides the same operations:

  * a numpy reference implementation (always available), and
  * an optional C++ fast path (`rnnpose_tpu/cpp/`, loaded via ctypes) used
    automatically when the shared library has been built — see
    `rnnpose_tpu.cpp.build`.

TPU-first difference: instead of ragged stacked clouds + length lists, each
level is **padded to a static size** so the device-side KPConv tower
(`models/kpconv_net.py`) compiles once. `calibrate_neighbor_limits`
reproduces the reference's 80th-percentile neighbor cap
(`data/preprocess.py:856-891`) as an offline constant.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..models.kpconv_net import KPConvConfig, PointPyramid

__all__ = [
    "grid_subsample",
    "radius_neighbors",
    "build_pyramid_arrays",
    "calibrate_neighbor_limits",
    "pad_and_batch_pyramids",
]


def _cpp():
    """Return the ctypes C++ ops module, or None if not built."""
    try:
        from ..cpp import native  # noqa: PLC0415

        return native if native.available() else None
    except Exception:
        return None


def grid_subsample(points: np.ndarray, dl: float) -> np.ndarray:
    """Voxel-grid barycenter subsampling (reference `grid_subsampling.cpp:5-110`).

    Args:
      points: (N, 3) float32.
      dl: voxel edge length.
    Returns:
      (M, 3) barycenters of occupied voxels, ordered by first occupancy.
    """
    native = _cpp()
    if native is not None:
        return native.grid_subsample(points, dl)
    origin = points.min(axis=0)
    vox = np.floor((points - origin) / dl).astype(np.int64)
    # Unique voxel ids in first-seen order.
    keys = (vox[:, 0] << 42) + (vox[:, 1] << 21) + vox[:, 2]
    uniq, first_idx, inv = np.unique(keys, return_index=True, return_inverse=True)
    order = np.argsort(first_idx)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    inv = rank[inv]
    sums = np.zeros((len(uniq), 3), np.float64)
    counts = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, points)
    np.add.at(counts, inv, 1)
    return (sums / counts[:, None]).astype(np.float32)


def radius_neighbors(
    queries: np.ndarray,
    supports: np.ndarray,
    radius: float,
    max_neighbors: int,
) -> np.ndarray:
    """Fixed-radius neighbor search, distance-ordered, dense with shadow index.

    Reference `neighbors.cpp:125-206` (`batch_ordered_neighbors`): for each
    query, the indices of supports within `radius` sorted by distance,
    truncated/padded to `max_neighbors` with the shadow index len(supports).
    """
    native = _cpp()
    if native is not None:
        return native.radius_neighbors(queries, supports, radius, max_neighbors)
    n, m = len(queries), len(supports)
    out = np.full((n, max_neighbors), m, np.int32)
    r2 = radius * radius
    # Chunk queries to bound the distance-matrix memory.
    chunk = max(1, int(2e7 / max(m, 1)))
    for s in range(0, n, chunk):
        q = queries[s : s + chunk]
        d2 = ((q[:, None, :] - supports[None, :, :]) ** 2).sum(-1)
        d2_masked = np.where(d2 <= r2, d2, np.inf)
        k = min(max_neighbors, m)
        idx = np.argpartition(d2_masked, kth=k - 1, axis=1)[:, :k]
        dsel = np.take_along_axis(d2_masked, idx, axis=1)
        order = np.argsort(dsel, axis=1)
        idx = np.take_along_axis(idx, order, axis=1)
        dsel = np.take_along_axis(dsel, order, axis=1)
        idx = np.where(np.isinf(dsel), m, idx).astype(np.int32)
        out[s : s + chunk, :k] = idx
    return out


@dataclasses.dataclass
class PyramidArrays:
    """Unpadded single-cloud pyramid (numpy)."""

    points: List[np.ndarray]
    neighbors: List[np.ndarray]
    pools: List[np.ndarray]
    upsamples: List[np.ndarray]


def build_pyramid_arrays(
    points: np.ndarray,
    cfg: KPConvConfig,
    neighbor_limits: Sequence[int],
) -> PyramidArrays:
    """Build the per-level points/neighbors/pools/upsamples for one cloud.

    Mirrors the reference collate loop (`data/preprocess.py:707-853`): layer
    l uses voxel size dl*2^l and query radius dl*2^l*conv_radius; `pools[l]`
    are neighbors of level-(l+1) queries in level-l supports; `upsamples[l]`
    are neighbors of level-l queries in level-(l+1) supports (used by
    nearest-upsample, first entry = closest).
    """
    levels: List[np.ndarray] = [points.astype(np.float32)]
    for l in range(1, cfg.num_layers):
        levels.append(grid_subsample(levels[-1], cfg.first_subsampling_dl * (2.0 ** l)))

    neighbors, pools, upsamples = [], [], []
    for l in range(cfg.num_layers):
        r = cfg.first_subsampling_dl * cfg.conv_radius * (2.0 ** l)
        neighbors.append(
            radius_neighbors(levels[l], levels[l], r, neighbor_limits[l])
        )
        if l + 1 < cfg.num_layers:
            pools.append(
                radius_neighbors(levels[l + 1], levels[l], r, neighbor_limits[l])
            )
            upsamples.append(
                radius_neighbors(
                    levels[l], levels[l + 1], 2.0 * r, neighbor_limits[l + 1]
                )
            )
    return PyramidArrays(levels, neighbors, pools, upsamples)


def calibrate_neighbor_limits(
    clouds: Sequence[np.ndarray],
    cfg: KPConvConfig,
    percentile: float = 0.8,
    untruncated_cap: int = 256,
) -> List[int]:
    """Estimate per-layer neighbor-count caps from data.

    Reference `calibrate_neighbors` (`data/preprocess.py:856-891`): histogram
    neighbor counts over samples, take the `percentile` quantile per layer.
    """
    counts: List[List[int]] = [[] for _ in range(cfg.num_layers)]
    for cloud in clouds:
        pyr = build_pyramid_arrays(cloud, cfg, [untruncated_cap] * cfg.num_layers)
        for l, nb in enumerate(pyr.neighbors):
            valid = (nb < len(pyr.points[l])).sum(axis=1)
            counts[l].extend(valid.tolist())
    return [
        max(1, int(np.quantile(np.asarray(c), percentile))) if c else untruncated_cap
        for c in counts
    ]


def pad_and_batch_pyramids(
    pyramids: Sequence[PyramidArrays],
    level_sizes: Optional[Sequence[int]] = None,
) -> PointPyramid:
    """Pad a batch of pyramids to common static sizes -> device PointPyramid.

    Shadow-index semantics are preserved under padding: neighbor indices >=
    the real count of their support level are remapped to the padded size
    N_pad (the device ops treat index >= N as shadow).
    """
    num_levels = pyramids[0].points.__len__()
    if level_sizes is None:
        level_sizes = [
            max(len(p.points[l]) for p in pyramids) for l in range(num_levels)
        ]

    def pad_pts(arr, n):
        out = np.zeros((n, 3), np.float32)
        out[: len(arr)] = arr[:n]
        return out

    def pad_idx(arr, n_rows, support_real, support_pad):
        k = arr.shape[1]
        out = np.full((n_rows, k), support_pad, np.int32)
        rows = min(len(arr), n_rows)
        a = arr[:rows].copy()
        a[a >= support_real] = support_pad
        a[a >= support_pad] = support_pad
        out[:rows] = a
        return out

    points, masks, neighbors, pools, upsamples = [], [], [], [], []
    for l in range(num_levels):
        n = level_sizes[l]
        points.append(np.stack([pad_pts(p.points[l], n) for p in pyramids]))
        masks.append(
            np.stack(
                [
                    (np.arange(n) < len(p.points[l])).astype(np.float32)
                    for p in pyramids
                ]
            )
        )
        neighbors.append(
            np.stack(
                [
                    pad_idx(p.neighbors[l], n, len(p.points[l]), n)
                    for p in pyramids
                ]
            )
        )
        if l + 1 < num_levels:
            n_next = level_sizes[l + 1]
            pools.append(
                np.stack(
                    [
                        pad_idx(p.pools[l], n_next, len(p.points[l]), n)
                        for p in pyramids
                    ]
                )
            )
            upsamples.append(
                np.stack(
                    [
                        pad_idx(p.upsamples[l], n, len(p.points[l + 1]), n_next)
                        for p in pyramids
                    ]
                )
            )
    return PointPyramid(points, masks, neighbors, pools, upsamples)
