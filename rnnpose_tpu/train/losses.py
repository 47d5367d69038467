"""Training losses.

Re-designs of the reference `model/losses.py` and
`model/PoseRefiner.py:29-55,378-436`:

  * `circle_loss` / `match_recall`: the D3Feat-style circle loss over 2D-3D
    correspondence pairs (`losses.py:179-236`) as a jit-safe masked/static
    computation — the reference's boolean indexing and host-side random
    subsampling become a validity mask (the data pipeline pads the
    correspondence set to a fixed `max_points`).
  * `point_alignment_loss`: mean |R_p X + t_p - (R_g X + t_g)| * 3
    (`losses.py:307-340`).
  * `sequence_flow_loss`: RAFT gamma-weighted flow loss
    (`PoseRefiner.py:29-55`).
  * `refiner_loss`: per-iteration combination over the refinement history
    (`PoseRefiner.py:378-426`), vmapped over the stacked iteration axis
    instead of a Python loop over history lists.
"""
from __future__ import annotations

import dataclasses
from typing import TYPE_CHECKING, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import lm as lm_lib
from ..geometry.precise import peinsum, pmatmul

if TYPE_CHECKING:  # annotation-only: a runtime import of models.refiner
    # would run models/__init__ and close an import cycle back into this
    # partially-initialized module (rnnpose.py reads CircleLossConfig at
    # class-definition time).
    from ..models.refiner import RefinerOutputs

EPS = 1e-5  # depth epsilon, kept equal to models.refiner.EPS
            # (reference `PoseRefiner.py:21`)

__all__ = [
    "CircleLossConfig",
    "circle_loss",
    "match_recall",
    "point_alignment_loss",
    "sequence_flow_loss",
    "RefinerLossConfig",
    "refiner_loss",
]

MAX_ERROR = 100.0  # reproj clamp (reference `PoseRefiner.py:23`)
MAX_FLOW = 400.0   # flow-magnitude cutoff (reference `PoseRefiner.py:26`)
_BIG = 1e5


@dataclasses.dataclass(frozen=True)
class CircleLossConfig:
    """Mirrors `config/linemod/template_fw0.5.yml:95-103`."""

    pos_radius: float = 0.011      # pos_radius + 1e-3 numeric guard
    safe_radius: float = 0.02
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    pos_optimal: float = 0.1
    neg_optimal: float = 1.4
    log_scale: float = 16.0
    max_points: int = 256
    weight: float = 0.001


def _pairwise_dist(a, b):
    d2 = (
        jnp.sum(a * a, -1)[:, None]
        + jnp.sum(b * b, -1)[None, :]
        - 2.0 * pmatmul(a, b.T)
    )
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def circle_loss(
    src_pts: jnp.ndarray,   # (P, 3) selected lifted points
    tgt_pts: jnp.ndarray,   # (P, 3) selected model points
    src_feats: jnp.ndarray,  # (P, C) 2D descriptors at those pixels
    tgt_feats: jnp.ndarray,  # (P, C) 3D descriptors
    valid: jnp.ndarray,      # (P,) 1.0 for real correspondence rows
    cfg: CircleLossConfig = CircleLossConfig(),
) -> jnp.ndarray:
    """Circle loss on correspondence pairs (reference `losses.py:179-220`).

    Rows/cols from padding are excluded by forcing them non-positive and
    non-negative (so their anchors are deselected, like the reference's
    row_sel/col_sel gating).
    """
    coords_dist = _pairwise_dist(src_pts, tgt_pts)
    feats_dist = _pairwise_dist(src_feats, tgt_feats)

    pair_valid = valid[:, None] * valid[None, :]
    pos_mask = (coords_dist < cfg.pos_radius) & (pair_valid > 0)
    neg_mask = (coords_dist > cfg.safe_radius) & (pair_valid > 0)

    row_sel = (pos_mask.sum(-1) > 0) & (neg_mask.sum(-1) > 0)
    col_sel = (pos_mask.sum(-2) > 0) & (neg_mask.sum(-2) > 0)

    pos_weight = jax.lax.stop_gradient(
        jnp.maximum(
            jnp.where(pos_mask, feats_dist, -_BIG) - cfg.pos_optimal, 0.0
        )
    )
    neg_weight = jax.lax.stop_gradient(
        jnp.maximum(
            cfg.neg_optimal - jnp.where(neg_mask, feats_dist, _BIG), 0.0
        )
    )

    logits_pos = cfg.log_scale * (feats_dist - cfg.pos_margin) * pos_weight
    logits_neg = cfg.log_scale * (cfg.neg_margin - feats_dist) * neg_weight
    # Real zero-weight pairs contribute exp(0)=1 to the logsumexp exactly like
    # the reference's masked entries; PADDED pairs are excluded entirely
    # (-inf) so the loss is invariant to the static padding size.
    neg_inf = jnp.asarray(-jnp.inf, logits_pos.dtype)
    logits_pos = jnp.where(pair_valid > 0, logits_pos, neg_inf)
    logits_neg = jnp.where(pair_valid > 0, logits_neg, neg_inf)
    lse_pos_row = jax.nn.logsumexp(logits_pos, axis=-1)
    lse_pos_col = jax.nn.logsumexp(logits_pos, axis=-2)
    lse_neg_row = jax.nn.logsumexp(logits_neg, axis=-1)
    lse_neg_col = jax.nn.logsumexp(logits_neg, axis=-2)

    loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / cfg.log_scale
    loss_col = jax.nn.softplus(lse_pos_col + lse_neg_col) / cfg.log_scale

    def masked_mean(x, m):
        m = m.astype(x.dtype)
        return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)

    return (masked_mean(loss_row, row_sel) + masked_mean(loss_col, col_sel)) / 2.0


def match_recall(
    src_pts, tgt_pts, src_feats, tgt_feats, valid,
    cfg: CircleLossConfig = CircleLossConfig(),
) -> jnp.ndarray:
    """Feature-match recall (reference `losses.py:223-236`)."""
    coords_dist = _pairwise_dist(src_pts, tgt_pts)
    feats_dist = _pairwise_dist(src_feats, tgt_feats)
    pair_valid = valid[:, None] * valid[None, :]
    pos_mask = (coords_dist < cfg.pos_radius) & (pair_valid > 0)
    has_pos = pos_mask.sum(-1) > 0
    feats_dist = jnp.where(pair_valid > 0, feats_dist, _BIG)
    sel = jnp.argmin(feats_dist, axis=-1)
    sel_dist = jnp.take_along_axis(coords_dist, sel[:, None], axis=-1)[:, 0]
    hit = (sel_dist < cfg.pos_radius) & has_pos
    return jnp.sum(hit) / jnp.maximum(jnp.sum(has_pos), 1e-12)


def point_alignment_loss(
    R_pred, t_pred, R_tgt, t_tgt, points, point_valid=None
) -> jnp.ndarray:
    """3D alignment: mean_|pred(X) - gt(X)| * 3 per sample, MEAN over batch
    (reference `losses.py:307-340`; x3 from the per-coordinate mean).

    Batch-reduction note: the reference literally SUMS over the batch (its
    `loss /= len(points)` is commented out, `losses.py:339`), but it only
    ever trains at bs=1/GPU where DDP's gradient averaging makes the
    effective multi-sample semantics a mean. Using the mean here keeps the
    YAML loss-weight balance (pcalign vs flow, `template_fw0.5.yml:78-81`)
    batch-size invariant — with a sum, this term silently outweighed the
    batch-meaned flow term by a factor of B in batched TPU training — and
    makes data-parallel sharding exactly match bs=1 reference training."""
    diff = peinsum("bij,bnj->bni", R_pred, points) + t_pred[:, None, :]
    diff = diff - (
        peinsum("bij,bnj->bni", R_tgt, points) + t_tgt[:, None, :]
    )
    a = jnp.abs(diff)
    if point_valid is not None:
        m = point_valid[..., None]
        per_b = jnp.sum(a * m, axis=(1, 2)) / jnp.maximum(
            jnp.sum(m, axis=(1, 2)) * 3.0, 1.0
        )
    else:
        per_b = jnp.mean(a, axis=(1, 2))
    return jnp.mean(per_b * 3.0)


def sequence_flow_loss(
    flow_preds: jnp.ndarray,  # (T, B, H, W, 2)
    flow_gt: jnp.ndarray,     # (B, H, W, 2)
    valid: jnp.ndarray,       # (B, H, W)
    gamma: float = 0.8,
    max_flow: float = MAX_FLOW,
) -> jnp.ndarray:
    """RAFT sequence loss (reference `PoseRefiner.py:29-55`).

    Parity note: the reference's only `cf_net` call site uses the default
    `iters=1` (`PoseRefiner.py:329`, `CFNet.py:109`), so each
    `flow_history[i]` entry is a length-1 list and the gamma weighting
    degenerates to 1.0 there. `refiner_loss` therefore passing length-1
    sequences per refinement iteration is reference-exact, not a
    divergence; the general T>1 weighting here exists for configs that
    raise the inner flow-iteration count.
    """
    mag = jnp.linalg.norm(flow_gt, axis=-1)
    v = ((valid >= 0.5) & (mag < max_flow)).astype(flow_gt.dtype)
    n = flow_preds.shape[0]
    weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=flow_gt.dtype)
    per = jnp.mean(
        jnp.abs(flow_preds - flow_gt[None]) * v[None, ..., None], axis=(1, 2, 3, 4)
    )
    return jnp.sum(weights * per)


@dataclasses.dataclass(frozen=True)
class RefinerLossConfig:
    """Weights from `template_fw0.5.yml:78-81`."""

    flow_weight: float = 0.5       # TRAIN_FLOW_WEIGHT
    reproj_weight: float = 0.0     # TRAIN_REPROJ_WEIGHT
    pcalign_weight: float = 1.0    # TRAIN_PCALIGN_WEIGHT
    gamma: float = 0.8


def refiner_loss(
    outs: RefinerOutputs,
    model_points: jnp.ndarray,       # (B, N, 3) original (unnormalized) points
    point_valid: Optional[jnp.ndarray] = None,
    cfg: RefinerLossConfig = RefinerLossConfig(),
    gru_iters: int = 4,
    legacy_tij_clobber: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Per-iteration motion losses over the refinement history
    (reference `compute_loss`, `PoseRefiner.py:378-426`).

    `legacy_tij_clobber` reproduces a reference aliasing quirk, verified in
    `tests/test_dress_rehearsal.py`: `Tij.identity_()` at each render
    iteration's top (`PoseRefiner.py:242`) rebinds `.G` on the SAME object
    already appended to `residual_pose_history`, so the stored Tij of the
    LAST inner iteration of every non-final render iter reads as identity by
    loss time. Its pcalign/reproj terms become constants (no gradient) —
    i.e. those iterations are silently excluded from pose-loss training.
    The released weights were trained this way; default True for parity.
    """
    T = outs.Tij_history.shape[0]
    eye4 = jnp.eye(4, dtype=outs.Tij_history.dtype)

    def one_iter(i):
        depth = outs.syn_depth_history[i // gru_iters] + EPS
        intr = outs.intrinsics_history[i]
        Tij = outs.Tij_history[i]
        if legacy_tij_clobber:
            clobbered = (i % gru_iters == gru_iters - 1) & (i < T - gru_iters)
            Tij = jnp.where(clobbered, eye4, Tij)
        Gij = outs.Tij_gt_history[i]
        flow_pred, vp = lm_lib.induced_flow(Tij, depth, intr)
        flow_star, vs = lm_lib.induced_flow(Gij, depth, intr)
        valid = vp * vs

        l_flow = sequence_flow_loss(
            outs.flow_history[i][None], flow_star, valid, cfg.gamma
        )
        reproj = jnp.mean(
            valid[..., None]
            * jnp.clip(jnp.abs(flow_pred - flow_star), 0.0, MAX_ERROR)
        )
        Tj_pred = pmatmul(Tij, outs.Ti_history[i])
        Tj_gt = pmatmul(Gij, outs.Ti_history[i])
        l_3d = point_alignment_loss(
            Tj_pred[:, :3, :3], Tj_pred[:, :3, 3],
            Tj_gt[:, :3, :3], Tj_gt[:, :3, 3],
            model_points, point_valid,
        )
        return l_flow, reproj, l_3d

    idx = jnp.arange(T)
    l_flow, l_reproj, l_3d = jax.vmap(one_iter)(idx)
    total = (
        cfg.pcalign_weight * jnp.sum(l_3d)
        + cfg.flow_weight * jnp.sum(l_flow)
        + cfg.reproj_weight * jnp.sum(l_reproj)
    )
    # Reported per-term values are the LAST iteration's, like the reference
    # (`PoseRefiner.py:429-436` returns the final loop values while only
    # `total_loss` accumulates) — so logged metrics compare 1:1 with
    # reference training logs. The optimized quantity is `total_loss`.
    return {
        "total_loss": total,
        "flow_loss": l_flow[-1],
        "reproj_loss": l_reproj[-1],
        "loss_3d_proj": l_3d[-1],
    }
