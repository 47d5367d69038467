"""Intrinsics utilities (reference `geometry/intrinsics.py`)."""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .projective import intrinsics_matrix_to_vec, intrinsics_vec_to_matrix

__all__ = [
    "intrinsics_vec_to_matrix",
    "intrinsics_matrix_to_vec",
    "scale_intrinsics",
    "rescale_depth_and_intrinsics",
]


def scale_intrinsics(intrinsics: jnp.ndarray, sx: float, sy: float) -> jnp.ndarray:
    """Rescale [fx, fy, cx, cy] for an image resized by (sx, sy)."""
    return jnp.stack(
        [
            intrinsics[..., 0] * sx,
            intrinsics[..., 1] * sy,
            intrinsics[..., 2] * sx,
            intrinsics[..., 3] * sy,
        ],
        axis=-1,
    )


def rescale_depth_and_intrinsics(
    depth: jnp.ndarray, intrinsics: jnp.ndarray, scale: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Downsample a depth map by integer stride and rescale intrinsics to match
    (reference `geometry/intrinsics.py:47-53`, used by the loss at 1/8 res).

    Nearest (strided) sampling keeps exact depth values — important because
    depth==0 encodes 'background'.
    """
    stride = int(round(1.0 / scale))
    d = depth[..., ::stride, ::stride]
    return d, scale_intrinsics(intrinsics, scale, scale)
