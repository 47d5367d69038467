"""Furthest point sampling (reference `utils/furthest_point_sample.py:6-54`).

Used to fragment mesh vertices into patches at renderer construction time
(`geometry/diff_render_optim.py:136-139`). Runs once per mesh at load — a
`lax.fori_loop` over the sample count with a running min-distance carry.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["furthest_point_sample"]


def furthest_point_sample(points: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Select `num_samples` indices by iterative furthest-point sampling.

    Args:
      points: (N, 3).
    Returns:
      (num_samples,) int32 indices; index 0 seeds the sampling.
    """
    n = points.shape[0]

    def body(i, state):
        min_d2, idxs = state
        last = points[idxs[i - 1]]
        d2 = jnp.sum((points - last) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        idxs = idxs.at[i].set(jnp.argmax(min_d2).astype(jnp.int32))
        return min_d2, idxs

    init = (jnp.full((n,), jnp.inf), jnp.zeros((num_samples,), jnp.int32))
    _, idxs = jax.lax.fori_loop(1, num_samples, body, init)
    return idxs
