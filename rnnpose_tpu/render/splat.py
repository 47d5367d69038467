"""Point-splat depth rendering (foreground masks).

TPU equivalent of the reference's `render_pointcloud`
(`geometry/diff_render_optim.py:369-402`) — a non-differentiable vertex
scatter used for foreground masks and zoom-crop boxes. Implemented with a
`scatter-min` (`.at[...].min`) which XLA lowers to an efficient sorted
scatter on TPU. Not on the gradient path (the reference detaches it too).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import projective as proj

__all__ = ["splat_depth", "splat_mask"]

_FAR = 1e6


def splat_depth(
    verts_cam: jnp.ndarray,
    intrinsics: jnp.ndarray,
    h: int,
    w: int,
    valid: jnp.ndarray | None = None,
    radius: int = 1,
) -> jnp.ndarray:
    """Splat camera-frame vertices into a depth map.

    Args:
      verts_cam: (B, V, 3) vertices in the camera frame.
      intrinsics: (B, 4).
      h, w: output size.
      valid: optional (B, V) mask for padded vertices.
      radius: splat half-size in pixels (each vertex covers a
        (2r+1)^2 footprint, closing small holes like the reference's
        point-radius rasterization).
    Returns:
      (B, H, W) depth map, 0 where nothing splatted.
    """
    uv, _ = proj.project(verts_cam, intrinsics[:, None, :])
    z = verts_cam[..., 2]
    ok = z > proj.MIN_DEPTH
    if valid is not None:
        ok = ok & (valid > 0)

    x = jnp.round(uv[..., 0]).astype(jnp.int32)
    y = jnp.round(uv[..., 1]).astype(jnp.int32)

    def splat_one(xb, yb, zb, okb):
        buf = jnp.full((h * w,), _FAR, dtype=z.dtype)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                xs = xb + dx
                ys = yb + dy
                inside = okb & (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
                idx = jnp.where(inside, ys * w + xs, 0)
                vals = jnp.where(inside, zb, _FAR)
                buf = buf.at[idx].min(vals, mode="drop")
        buf = buf.reshape(h, w)
        return jnp.where(buf < _FAR, buf, 0.0)

    return jax.vmap(splat_one)(x, y, z, ok)


def splat_mask(
    verts_cam: jnp.ndarray,
    intrinsics: jnp.ndarray,
    h: int,
    w: int,
    valid: jnp.ndarray | None = None,
    radius: int = 1,
) -> jnp.ndarray:
    """Foreground mask from the splatted depth (depth > 0)."""
    d = splat_depth(verts_cam, intrinsics, h, w, valid, radius)
    return (d > 0).astype(verts_cam.dtype)
