"""6-DoF pose evaluation metrics (jit-friendly, device-side).

Re-design of the reference `utils/eval_metric.py:59-356` (`LineMODEvaluator`
metric kernels) and `utils/geometric.py:36-40`:

  * `add_error` / `adds_error`: average model-point distance; the symmetric
    variant matches each predicted point to its nearest GT point — the
    reference calls a CUDA brute-force NN kernel
    (`thirdparty/nn/nearest_neighborhood.cu:48-83`); on TPU this is a
    pairwise-distance matmul + row-min (`ops/knn.py`).
  * `projection_2d_error`: mean reprojection distance (@5px threshold).
  * `translation_error` / `rotation_error_deg`: 5cm5deg ingredients.

All functions take `(R, t)` batches and padded model points with a validity
mask, return per-sample scalars; thresholding/accumulation happens in
`eval/evaluator.py` on the host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.knn import pairwise_sqdist
from ..geometry.precise import peinsum

__all__ = [
    "transform_pts",
    "add_error",
    "adds_error",
    "projection_2d_error",
    "translation_error",
    "rotation_error_deg",
]


def transform_pts(R: jnp.ndarray, t: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(B,3,3), (B,3), (B,N,3) -> (B,N,3)."""
    return peinsum("bij,bnj->bni", R, pts) + t[:, None, :]


def add_error(R_pred, t_pred, R_gt, t_gt, pts, valid=None) -> jnp.ndarray:
    """ADD: mean aligned-point distance (reference `eval_metric.py:120-147`)."""
    d = jnp.linalg.norm(
        transform_pts(R_pred, t_pred, pts) - transform_pts(R_gt, t_gt, pts),
        axis=-1,
    )
    if valid is None:
        return jnp.mean(d, axis=-1)
    m = valid.astype(d.dtype)
    return jnp.sum(d * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)


def adds_error(R_pred, t_pred, R_gt, t_gt, pts, valid=None) -> jnp.ndarray:
    """ADD-S for symmetric objects: for each GT-posed point, the distance to
    its nearest PREDICTED-posed point, averaged over GT points — the
    reference's matching direction (`eval_metric.py:166-171`:
    `idxs = find_nearest_point_idx(model_pred, model_targets)` queries the
    targets against the prediction set, then averages
    `model_pred[idxs] - model_targets`). The opposite direction (per-pred
    nearest GT) differs on asymmetric-error poses; caught by
    tests/test_eval_reference_ab.py."""
    a = transform_pts(R_pred, t_pred, pts)
    b = transform_pts(R_gt, t_gt, pts)
    d2 = pairwise_sqdist(a, b)  # (B, N_pred, N_gt)
    if valid is not None:
        big = jnp.asarray(1e12, d2.dtype)
        d2 = jnp.where(valid[:, :, None] > 0, d2, big)  # mask pred rows
    d = jnp.sqrt(jnp.min(d2, axis=-2))  # per-GT-point nearest pred
    if valid is None:
        return jnp.mean(d, axis=-1)
    m = valid.astype(d.dtype)
    return jnp.sum(d * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)


def projection_2d_error(R_pred, t_pred, R_gt, t_gt, pts, K, valid=None) -> jnp.ndarray:
    """Mean 2D reprojection distance in pixels
    (reference `eval_metric.py:102-110`). K: (B, 3, 3) or (B, 4) vec."""
    if K.ndim == 2 and K.shape[-1] == 4:
        fx, fy, cx, cy = K[:, 0], K[:, 1], K[:, 2], K[:, 3]
    else:
        fx, fy, cx, cy = K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]

    def project(p):
        z = jnp.maximum(p[..., 2], 1e-6)
        u = fx[:, None] * p[..., 0] / z + cx[:, None]
        v = fy[:, None] * p[..., 1] / z + cy[:, None]
        return jnp.stack([u, v], axis=-1)

    d = jnp.linalg.norm(
        project(transform_pts(R_pred, t_pred, pts))
        - project(transform_pts(R_gt, t_gt, pts)),
        axis=-1,
    )
    if valid is None:
        return jnp.mean(d, axis=-1)
    m = valid.astype(d.dtype)
    return jnp.sum(d * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)


def translation_error(t_pred, t_gt) -> jnp.ndarray:
    """Euclidean translation error (B,)."""
    return jnp.linalg.norm(t_pred - t_gt, axis=-1)


def rotation_error_deg(R_pred, R_gt) -> jnp.ndarray:
    """Geodesic rotation error in degrees via the chordal form
    (reference `utils/geometric.py:36-40`)."""
    trace = peinsum("bij,bij->b", R_pred, R_gt)
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))
