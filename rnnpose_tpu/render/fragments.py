"""Mesh fragmentation into FPS patches.

Reference `fragmentation_fps` (`utils/furthest_point_sample.py:6-54`, used at
renderer construction `geometry/diff_render_optim.py:136-139`) splits the
vertex set into 64 patches around furthest-point-sampled centers; the patch
utilities (`render_pat_id`/`render_offset_map`, 163-180/246-266) are mostly
vestigial in the reference but kept here for surface parity — patch ids can
be rendered as just another vertex attribute through
`render/raster.interpolate_attributes`.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.fps import furthest_point_sample
from ..ops.knn import nearest_neighbor_idx

__all__ = ["fragment_vertices"]


def fragment_vertices(
    verts: np.ndarray, num_patches: int = 64
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FPS-fragment vertices into patches.

    Returns:
      pat_centers: (P, 3) patch center coordinates.
      pat_center_inds: (P,) vertex indices of the centers.
      vert_frag_ids: (V,) patch id of every vertex (nearest center).
    """
    v = jnp.asarray(verts, jnp.float32)
    idx = furthest_point_sample(v, num_patches)
    centers = v[idx]
    frag = nearest_neighbor_idx(v, centers)
    return (
        np.asarray(centers),
        np.asarray(idx),
        np.asarray(frag, np.int32),
    )
