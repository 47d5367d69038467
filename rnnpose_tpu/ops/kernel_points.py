"""Kernel-point disposition generation.

The reference optimizes kernel point layouts by repulsive-potential descent
and caches them as .ply files (`thirdparty/kpconv/kernels/kernel_points.py:391+`,
shipped `k_015_center_3D.ply`). Same idea here, numpy at model-build time
(runs once, microseconds for K=15) with an in-process cache — no file assets.

Points repel each other (inverse-square) inside a unit ball, with an
attractive pull keeping them in the ball and the first point pinned at the
center ('center' mode). The result is scaled by the layer radius.
"""
from __future__ import annotations

import functools

import numpy as np

__all__ = ["make_kernel_points"]


@functools.lru_cache(maxsize=32)
def _unit_dispositions(num_points: int, seed: int, fixed: str) -> tuple:
    rs = np.random.RandomState(seed)
    pts = rs.randn(num_points, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True) + 1e-9
    pts *= rs.uniform(0.3, 1.0, (num_points, 1)) ** (1 / 3)
    if fixed == "center":
        pts[0] = 0.0

    lr = 0.01
    for _ in range(2000):
        diff = pts[:, None, :] - pts[None, :, :]
        d2 = np.sum(diff * diff, axis=-1) + 1e-9
        np.fill_diagonal(d2, np.inf)
        # Inverse-square repulsion + spring toward the ball interior.
        force = np.sum(diff / (d2[..., None] * np.sqrt(d2)[..., None]), axis=1)
        r = np.linalg.norm(pts, axis=1, keepdims=True)
        force -= pts * np.maximum(r - 0.7, 0.0) * 50.0 / (r + 1e-9)
        norm = np.linalg.norm(force, axis=1, keepdims=True)
        force = force / np.maximum(norm, 1.0)  # clip step direction
        pts = pts + lr * force
        if fixed == "center":
            pts[0] = 0.0
        # keep inside unit ball
        r = np.linalg.norm(pts, axis=1, keepdims=True)
        pts = np.where(r > 1.0, pts / np.maximum(r, 1e-9), pts)
    return tuple(map(tuple, pts))


def make_kernel_points(
    num_points: int = 15,
    radius: float = 1.0,
    dimension: int = 3,
    fixed: str = "center",
    seed: int = 42,
) -> np.ndarray:
    """Generate `num_points` kernel dispositions within `radius`.

    Matches the reference's `load_kernels` contract: points roughly uniform
    in the ball of `radius`, first point at the origin for fixed='center'.
    Deterministic (no per-call random rotation — TPU graphs want constants).
    """
    assert dimension == 3, "only 3D kernels supported"
    pts = np.asarray(_unit_dispositions(num_points, seed, fixed), np.float32)
    # The reference scales dispositions so the average first-ring distance is
    # ~radius * 0.66; scaling the unit-ball layout by the radius directly
    # gives the same coverage for the 'sum' aggregation mode.
    return (pts * radius).astype(np.float32)
