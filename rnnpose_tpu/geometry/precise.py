"""Exact-f32 matmul/einsum for pose-critical math.

TPU MXU f32 contractions run at DEFAULT precision = bf16 passes unless
pinned. For neural-net features that's the right trade; for SE(3) pose
algebra, projective geometry, LM normal equations and metric evaluation it
silently injects ~4e-3 relative error — measured 5 mm on a 4x4 pose compose
and 2.7 mm on transformed points (vs exact CPU f32), which is fatal for
ADD thresholds down to 2 mm (0.02d).

Every contraction in those paths is tiny (K in {3, 4, 6}), so HIGHEST
precision costs nothing measurable. Use these wrappers for anything that
touches poses, 3D points, Jacobians, or evaluation metrics; use plain
jnp ops (or explicit bf16) for NN feature math.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["pmatmul", "peinsum", "HIGHEST"]

HIGHEST = jax.lax.Precision.HIGHEST

pmatmul = functools.partial(jnp.matmul, precision=HIGHEST)
peinsum = functools.partial(jnp.einsum, precision=HIGHEST)
