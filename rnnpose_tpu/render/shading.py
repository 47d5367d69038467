"""Shading for the rendered reference image.

The reference renders the RGB reference view with PyTorch3D's
SoftPhongShader + point lights (`geometry/diff_render_optim.py:201-244`).
Here: per-vertex normals computed host-side at mesh load
(`compute_vertex_normals`), interpolated as just another vertex attribute,
and a headlight diffuse term applied in-graph — visually equivalent for the
matching task (the flow net compares renders against photos at 240px) and
free of any lighting state.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["compute_vertex_normals", "headlight_shade"]


def compute_vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals (host, numpy). Degenerate/padded
    faces contribute zero."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)  # area-weighted
    out = np.zeros_like(verts)
    for k in range(3):
        np.add.at(out, faces[:, k], fn)
    norm = np.linalg.norm(out, axis=-1, keepdims=True)
    return (out / np.maximum(norm, 1e-12)).astype(np.float32)


def headlight_shade(
    colors: jnp.ndarray,
    normals_cam: jnp.ndarray,
    ambient: float = 0.4,
    diffuse: float = 0.6,
) -> jnp.ndarray:
    """Shade interpolated colors with a camera-colocated light.

    Args:
      colors: (..., 3) interpolated albedo.
      normals_cam: (..., 3) interpolated normals in camera frame (not
        necessarily unit after interpolation).
    """
    n = normals_cam / jnp.maximum(
        jnp.linalg.norm(normals_cam, axis=-1, keepdims=True), 1e-6
    )
    # Headlight direction = -z (camera looks along +z); two-sided.
    lambert = jnp.abs(n[..., 2:3])
    return colors * (ambient + diffuse * lambert)
