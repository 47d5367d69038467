"""Projective camera ops with analytic Jacobians (TPU-native, pure jnp).

Re-design of the reference `geometry/projective_ops.py` (coords_grid: 25-44,
backproject w/ intrinsics Jacobian: 68-99, project w/ point+focal Jacobians
and z-clamping: 103-133, normalize_coords_grid: 11-23).

All functions are shape-polymorphic over leading batch dims and operate on
channel-last layouts (H, W, C) — the natural layout for XLA/TPU (lane dim =
C or W). Intrinsics are (..., 4) vectors [fx, fy, cx, cy].
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from .precise import peinsum

__all__ = [
    "coords_grid",
    "normalize_coords",
    "intrinsics_vec_to_matrix",
    "intrinsics_matrix_to_vec",
    "backproject",
    "project",
    "transform_points",
    "local_perturb_jacobian",
]

MIN_DEPTH = 0.01  # reference clamps Z >= 0.01 (`projective_ops.py:103-133`)


def coords_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-coordinate grid (H, W, 2) with channel order (x, y)."""
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([grid_x, grid_y], axis=-1)


def normalize_coords(coords: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Pixel coords -> [-1, 1] (reference `normalize_coords_grid`)."""
    x = 2.0 * coords[..., 0] / (w - 1) - 1.0
    y = 2.0 * coords[..., 1] / (h - 1) - 1.0
    return jnp.stack([x, y], axis=-1)


def intrinsics_vec_to_matrix(k: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [fx, fy, cx, cy] -> (..., 3, 3) K matrix."""
    fx, fy, cx, cy = k[..., 0], k[..., 1], k[..., 2], k[..., 3]
    zero, one = jnp.zeros_like(fx), jnp.ones_like(fx)
    rows = [
        jnp.stack([fx, zero, cx], axis=-1),
        jnp.stack([zero, fy, cy], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def intrinsics_matrix_to_vec(K: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) [fx, fy, cx, cy]."""
    return jnp.stack(
        [K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]], axis=-1
    )


def backproject(depth: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Depth map -> camera-frame points.

    Args:
      depth: (..., H, W).
      intrinsics: (..., 4) [fx, fy, cx, cy] (broadcast over H, W).
    Returns:
      points: (..., H, W, 3) with X = (u-cx)/fx * Z etc.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    grid = coords_grid(h, w, dtype=depth.dtype)  # (H, W, 2)
    fx = intrinsics[..., 0][..., None, None]
    fy = intrinsics[..., 1][..., None, None]
    cx = intrinsics[..., 2][..., None, None]
    cy = intrinsics[..., 3][..., None, None]
    x = (grid[..., 0] - cx) / fx * depth
    y = (grid[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def project(
    points: jnp.ndarray,
    intrinsics: jnp.ndarray,
    jacobian: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Camera-frame points -> pixel coords, with optional point-Jacobian.

    Args:
      points: (..., 3) XYZ in camera frame.
      intrinsics: broadcastable (..., 4) [fx, fy, cx, cy].
      jacobian: if True also return d(u,v)/d(X,Y,Z): (..., 2, 3).

    Z is clamped to MIN_DEPTH and the inverse-depth is zeroed where the clamp
    engaged, reproducing the reference's guard (`projective_ops.py:103-133`)
    that kills gradients/residuals from behind-camera points.
    """
    fx, fy = intrinsics[..., 0], intrinsics[..., 1]
    cx, cy = intrinsics[..., 2], intrinsics[..., 3]
    X, Y, Z = points[..., 0], points[..., 1], points[..., 2]
    valid = Z > MIN_DEPTH
    z_clamped = jnp.maximum(Z, MIN_DEPTH)
    zinv = jnp.where(valid, 1.0 / z_clamped, 0.0)
    u = fx * X * zinv + cx
    v = fy * Y * zinv + cy
    uv = jnp.stack([u, v], axis=-1)
    if not jacobian:
        return uv, None
    zero = jnp.zeros_like(zinv)
    # du/dX = fx/Z, du/dY = 0, du/dZ = -fx X / Z^2 (all zeroed when invalid)
    j_row_u = jnp.stack([fx * zinv, zero, -fx * X * zinv * zinv], axis=-1)
    j_row_v = jnp.stack([zero, fy * zinv, -fy * Y * zinv * zinv], axis=-1)
    jac = jnp.stack([j_row_u, j_row_v], axis=-2)  # (..., 2, 3)
    return uv, jac


def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) to points.

    Two calling conventions, disambiguated by rank:
      * point sets:  T (..., 4, 4) with points (..., N, 3)  [same ndim]
      * single points: T (..., 4, 4) with points (..., 3)   [ndim - 1]
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if points.ndim == T.ndim:  # batched point sets
        return peinsum("...ij,...nj->...ni", R, points) + t[..., None, :]
    return peinsum("...ij,...j->...i", R, points) + t


def local_perturb_jacobian(points_transformed: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of a left-multiplicative se(3) perturbation at the output point.

    For Y = T(X), d/dxi [exp(xi) Y] at xi=0 is the (..., 3, 6) matrix
    [I | -hat(Y)] under the [v, w] twist ordering — the reference's
    `jac_local_perturb` (`geometry/transformation.py:27-46`).
    """
    Y = points_transformed
    x, y, z = Y[..., 0], Y[..., 1], Y[..., 2]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([one, zero, zero, zero, z, -y], axis=-1),
        jnp.stack([zero, one, zero, -z, zero, x], axis=-1),
        jnp.stack([zero, zero, one, y, -x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)  # (..., 3, 6)
