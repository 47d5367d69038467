"""Nearest-neighbor ops as MXU-shaped reductions.

The reference uses a brute-force CUDA kernel (one thread per query,
`thirdparty/nn/nearest_neighborhood.cu:48-83`) behind a cffi wrapper, used by
the evaluator's symmetric-object ADD-S metric (`utils/eval_metric.py:127-168`).
On TPU the same computation is a pairwise-distance matmul + argmin — one
`jnp.einsum` on the MXU, no native code needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pairwise_sqdist", "nearest_neighbor_idx", "nearest_neighbor_dist", "knn"]


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances (..., N, D) x (..., M, D) -> (..., N, M).

    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b — the cross term is an MXU matmul.
    """
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    cross = jnp.einsum(
        "...nd,...md->...nm", a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact f32: mm-scale ADD-S
    )
    return jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)


def nearest_neighbor_idx(queries: jnp.ndarray, refs: jnp.ndarray) -> jnp.ndarray:
    """Index of nearest ref point for each query (..., N)."""
    return jnp.argmin(pairwise_sqdist(queries, refs), axis=-1)


def nearest_neighbor_dist(queries: jnp.ndarray, refs: jnp.ndarray) -> jnp.ndarray:
    """Distance to nearest ref for each query (..., N)."""
    return jnp.sqrt(jnp.min(pairwise_sqdist(queries, refs), axis=-1))


def knn(queries: jnp.ndarray, refs: jnp.ndarray, k: int):
    """k nearest refs per query: returns (dists (..., N, k), idx (..., N, k))."""
    d2 = pairwise_sqdist(queries, refs)
    neg_d, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), idx
