"""In-graph object-centric zoom-crop.

The reference computes the zoom-crop affine on the host with OpenCV
(`model/PoseRefiner.py:145-218`: numpy mask -> bbox -> cv2.getAffineTransform
-> F.affine_grid), forcing a GPU->CPU sync every render iteration. Here the
whole thing is expressed in-graph from the splatted foreground mask via
masked min/max reductions, so the full refinement loop stays inside one XLA
program with static shapes.

Convention: a crop is parameterized by (cx, cy, half) — center and half-side
of a square source window — mapped onto an out_size x out_size target.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import projective as proj

__all__ = [
    "mask_bbox",
    "square_crop_params",
    "crop_intrinsics",
    "crop_source_coords",
    "mask_zoom_crop_params",
]

_BIG = 1e9


def mask_bbox(mask: jnp.ndarray) -> jnp.ndarray:
    """Bounding box of nonzero pixels per batch element.

    Args:
      mask: (B, H, W) float or bool.
    Returns:
      (B, 4) [x0, y0, x1, y1] (inclusive). If the mask is empty the full
      image box is returned — keeps downstream math finite.
    """
    h, w = mask.shape[-2], mask.shape[-1]
    m = mask > 0
    grid = proj.coords_grid(h, w)  # (H, W, 2)
    gx, gy = grid[..., 0], grid[..., 1]
    x0 = jnp.min(jnp.where(m, gx, _BIG), axis=(-2, -1))
    y0 = jnp.min(jnp.where(m, gy, _BIG), axis=(-2, -1))
    x1 = jnp.max(jnp.where(m, gx, -_BIG), axis=(-2, -1))
    y1 = jnp.max(jnp.where(m, gy, -_BIG), axis=(-2, -1))
    empty = ~jnp.any(m, axis=(-2, -1))
    x0 = jnp.where(empty, 0.0, x0)
    y0 = jnp.where(empty, 0.0, y0)
    x1 = jnp.where(empty, float(w - 1), x1)
    y1 = jnp.where(empty, float(h - 1), y1)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def square_crop_params(bbox: jnp.ndarray, margin: float = 0.4) -> jnp.ndarray:
    """Square crop window around a bbox with relative margin.

    Reference margin 0.4 (`model/PoseRefiner.py:145-218`).
    Args:
      bbox: (B, 4) [x0, y0, x1, y1].
    Returns:
      (B, 3) [cx, cy, half].
    """
    cx = (bbox[..., 0] + bbox[..., 2]) * 0.5
    cy = (bbox[..., 1] + bbox[..., 3]) * 0.5
    half = jnp.maximum(bbox[..., 2] - bbox[..., 0], bbox[..., 3] - bbox[..., 1])
    half = half * 0.5 * (1.0 + margin)
    half = jnp.maximum(half, 1.0)
    return jnp.stack([cx, cy, half], axis=-1)


def mask_zoom_crop_params(mask: jnp.ndarray, margin: float = 0.4) -> jnp.ndarray:
    """mask (B, H, W) -> (B, 3) [cx, cy, half]."""
    return square_crop_params(mask_bbox(mask), margin)


def crop_intrinsics(
    intrinsics: jnp.ndarray, crop_params: jnp.ndarray, out_size: int
) -> jnp.ndarray:
    """Intrinsics of the virtual zoomed-in camera.

    The crop maps source window [c - half, c + half] -> [0, out_size], i.e.
    u' = (u - (cx - half)) * s with s = out_size / (2 * half).
    Args:
      intrinsics: (B, 4) [fx, fy, cx, cy].
      crop_params: (B, 3) [ccx, ccy, half].
    Returns:
      (B, 4) cropped intrinsics.
    """
    s = out_size / (2.0 * crop_params[..., 2])
    fx = intrinsics[..., 0] * s
    fy = intrinsics[..., 1] * s
    cx = (intrinsics[..., 2] - (crop_params[..., 0] - crop_params[..., 2])) * s
    cy = (intrinsics[..., 3] - (crop_params[..., 1] - crop_params[..., 2])) * s
    return jnp.stack([fx, fy, cx, cy], axis=-1)


def crop_source_coords(crop_params: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Source-image pixel coords for every crop pixel (for bilinear warping).

    Args:
      crop_params: (B, 3) [cx, cy, half].
    Returns:
      (B, out_size, out_size, 2) source (x, y) coords.
    """
    grid = proj.coords_grid(out_size, out_size)  # (S, S, 2)
    s = (2.0 * crop_params[..., 2]) / out_size   # (B,)
    origin = crop_params[..., :2] - crop_params[..., 2:3]  # (B, 2)
    return grid[None] * s[:, None, None, None] + origin[:, None, None, :]
