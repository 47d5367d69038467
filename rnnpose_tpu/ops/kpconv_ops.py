"""KPConv core ops: kernel-point convolution, pooling, upsampling gathers.

TPU-native re-design of the reference `thirdparty/kpconv/kpconv_blocks.py`
(gather: 29-60, KPConv.forward: 231-379, closest_pool / max_pool blocks:
389-443). Differences by design:

  * **Padded, static shapes.** The reference stacks ragged point clouds into
    one long tensor with per-batch length lists; here every cloud is padded
    to a fixed size with a *shadow index* sentinel (= num support points)
    marking invalid neighbors, exactly like the reference's C++ neighbor
    search emits (`neighbors.cpp:202-204`). This keeps XLA shapes static.
  * **Matmul-shaped aggregation.** The (neighbors x kernel-points) influence
    tensor is contracted with gathered features via two einsums that XLA maps
    onto the MXU, instead of the reference's gather/expand loop.
  * Batch handling via `vmap` rather than stacked clouds.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "gather_neighbors",
    "kpconv",
    "max_pool",
    "closest_pool",
    "global_average",
]


def gather_neighbors(
    features: jnp.ndarray, neighb_inds: jnp.ndarray
) -> jnp.ndarray:
    """Gather neighbor features with shadow-index masking.

    Args:
      features: (M, C) support features.
      neighb_inds: (N, K) int indices into the support set; index >= M is a
        shadow (missing) neighbor and contributes zeros.
    Returns:
      (N, K, C).
    """
    M = features.shape[0]
    valid = neighb_inds < M
    idx = jnp.where(valid, neighb_inds, 0)
    out = features[idx]  # (N, K, C)
    return out * valid[..., None].astype(features.dtype)


def kpconv(
    q_pts: jnp.ndarray,
    s_pts: jnp.ndarray,
    neighb_inds: jnp.ndarray,
    features: jnp.ndarray,
    kernel_points: jnp.ndarray,
    weights: jnp.ndarray,
    kp_extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
) -> jnp.ndarray:
    """Rigid kernel-point convolution (reference `KPConv.forward`, 231-379).

    Args:
      q_pts: (N, 3) query points.
      s_pts: (M, 3) support points.
      neighb_inds: (N, K) neighbor indices into s_pts (shadow = M).
      features: (M, C_in) support features.
      kernel_points: (P, 3) kernel point dispositions (radius-scaled).
      weights: (P, C_in, C_out) per-kernel-point weight matrices.
      kp_extent: influence radius of each kernel point.
      influence: 'linear' | 'gaussian' | 'constant'.
      aggregation: 'sum' | 'closest'.
    Returns:
      (N, C_out) output features, normalized by valid-neighbor count.
    """
    # Kernel dispositions are constants during training (the reference keeps
    # them as requires_grad=False Parameters, `kpconv_blocks.py:99`). Severing
    # their gradient here also prevents a real NaN: the kp-grad branch
    # multiplies the incoming cotangent by the 1e6 shadow-neighbor offsets,
    # which overflows f32 to +/-inf whenever upstream norms amplify the
    # cotangent, and the inf sum turns the whole global grad norm NaN.
    kernel_points = jax.lax.stop_gradient(kernel_points)
    M = s_pts.shape[0]
    valid = neighb_inds < M                            # (N, K)
    idx = jnp.where(valid, neighb_inds, 0)

    # Neighbor positions relative to the query point; shadow neighbors are
    # pushed far away so their influence is exactly zero (reference pads the
    # shadow point at 1e6, `kpconv_blocks.py:270-271`).
    neighbors = s_pts[idx] - q_pts[:, None, :]         # (N, K, 3)
    neighbors = jnp.where(valid[..., None], neighbors, 1e6)

    # Squared distances to every kernel point: (N, K, P).
    diff = neighbors[:, :, None, :] - kernel_points[None, None, :, :]
    sq_dist = jnp.sum(diff * diff, axis=-1)

    if influence == "constant":
        all_weights = jnp.ones_like(sq_dist)
    elif influence == "linear":
        # Safe sqrt: sq_dist == 0 exactly when a self-neighbor meets the
        # center kernel point; d/dx sqrt(x) is infinite there and
        # kernel_points is a (frozen, but differentiated) parameter.
        dist = jnp.sqrt(jnp.maximum(sq_dist, 1e-12))
        all_weights = jnp.maximum(0.0, 1.0 - dist / kp_extent)
    elif influence == "gaussian":
        sigma = kp_extent * 0.3
        all_weights = jnp.exp(-sq_dist / (2.0 * sigma * sigma))
    else:
        raise ValueError(f"unknown influence mode {influence!r}")

    if aggregation == "closest":
        closest = jnp.argmin(sq_dist, axis=-1)         # (N, K)
        onehot = jax.nn.one_hot(closest, kernel_points.shape[0], dtype=all_weights.dtype)
        all_weights = all_weights * onehot
    elif aggregation != "sum":
        raise ValueError(f"unknown aggregation mode {aggregation!r}")

    all_weights = all_weights * valid[..., None].astype(all_weights.dtype)

    neighb_x = gather_neighbors(features, neighb_inds)  # (N, K, C_in)

    # (N, P, C_in) = sum_K influence * features  — MXU contraction 1.
    weighted = jnp.einsum(
        "nkp,nkc->npc", all_weights, neighb_x, preferred_element_type=jnp.float32
    )
    # (N, C_out) = sum_P weighted @ W_p        — MXU contraction 2.
    out = jnp.einsum(
        "npc,pcd->nd", weighted, weights, preferred_element_type=jnp.float32
    )

    # Density normalization (reference 370-375): the reference counts
    # neighbors whose *feature sum* is > 0 — shadow rows gather the appended
    # zero feature and drop out, but so do real neighbors whose channel sum
    # happens to be non-positive. Quirk replicated exactly for converted
    # -weight parity (tests/test_torch_parity.py).
    feat_sum = jnp.sum(neighb_x, axis=-1)              # (N, K)
    n_valid = jnp.maximum(
        jnp.sum((feat_sum > 0.0).astype(out.dtype), axis=-1), 1.0
    )
    return out / n_valid[:, None]


def max_pool(features: jnp.ndarray, pool_inds: jnp.ndarray) -> jnp.ndarray:
    """Max over pooled neighbors (reference `max_pool`,
    `kpconv_blocks.py:88-104`).

    The reference pads a ZERO shadow row and takes the max over all K
    entries including shadows — so the result is effectively clamped below
    at 0 whenever any shadow index is present (which is nearly always, the
    neighbor lists being truncated radius searches). Verified
    activation-for-activation in `tests/test_torch_parity.py`
    (test_kpfcnn_tower_parity).
    """
    M = features.shape[0]
    valid = pool_inds < M
    idx = jnp.where(valid, pool_inds, 0)
    x = features[idx]                                  # (N, K, C)
    x = jnp.where(valid[..., None], x, 0.0)            # shadow row = zeros
    return jnp.max(x, axis=1)


def closest_pool(features: jnp.ndarray, pool_inds: jnp.ndarray) -> jnp.ndarray:
    """Take the first (nearest) neighbor's features — the neighbor lists are
    distance-ordered by the search (reference `closest_pool` /
    `NearestUpsampleBlock`)."""
    M = features.shape[0]
    first = pool_inds[:, 0]
    valid = first < M
    idx = jnp.where(valid, first, 0)
    return features[idx] * valid[:, None].astype(features.dtype)


def global_average(features: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked mean over points: (N, C) -> (C,)."""
    if mask is None:
        return jnp.mean(features, axis=0)
    w = mask.astype(features.dtype)
    return jnp.sum(features * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
