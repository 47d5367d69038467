"""Per-frame preprocessing (host-side, numpy).

Re-design of the reference `data/preprocess.py:367-501`:

  * model-point cap (`max_points=20000`) — deterministic head-truncation here
    (vertex order must match the render mesh for feature/vertex alignment;
    the reference's random permutation breaks that for >20k-vert meshes);
  * model normalization: center + scale by bbox extent; the compensated
    pose `t' = R c + t` together with `(X - c)/s` puts lifted depth points
    and model points in the SAME normalized frame for correspondence search
    (reference 397-406, 464-469) — the refiner keeps operating on the
    original metric mesh/poses;
  * object-centric patch crop around the init-pose mask with margin 0.85
    -> fixed output size with intrinsics update (`patch_crop`, 181-254);
  * depth lifting + 2D-3D radius correspondences (KD-tree, K=5; reference
    uses Open3D, here scipy.cKDTree) — padded to a FIXED count with the
    background-negative rows appended (`model/RNNPose.py:242-270`), so the
    device-side loss sees static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from ..models.rnnpose import CorrespondenceSet

__all__ = [
    "PreprocessConfig",
    "normalize_model",
    "patch_crop",
    "mask_depth_to_points",
    "get_correspondences",
    "build_correspondence_set",
    "TooFewCorrespondences",
]


class TooFewCorrespondences(Exception):
    """Raised like the reference (`preprocess.py:478-482`) to trigger the
    dataset's skip-to-next-sample path (`linemod_dataset.py:421-437`)."""


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    max_points: int = 20000
    correspondence_radius: float = 0.01
    crop_margin_ratio: float = 0.85     # reference patch-crop margin
    crop_size: int = 320
    num_corr: int = 256                 # device-side circle-loss budget
    bg_fraction: float = 0.1            # bg rows appended (RNNPose.py:262)
    min_correspondences: int = 10


def normalize_model(
    points: np.ndarray, RT: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Center+scale model; compensate the pose translation.

    Returns (points_norm, RT_norm(3x4), center, scale) with
    t' = R c + t (reference `preprocess.py:397-406`).
    """
    center = points.mean(axis=0)
    scale = float((points.max(0) - points.min(0)).max())
    pts = (points - center) / scale
    RT_n = RT.copy()
    RT_n[:, 3] = RT[:, :3] @ center + RT[:, 3]
    return pts.astype(np.float32), RT_n.astype(np.float32), center.astype(np.float32), scale


def patch_crop(
    image: np.ndarray,
    depth: Optional[np.ndarray],
    mask: np.ndarray,
    K: np.ndarray,
    margin_ratio: float = 0.85,
    output_size: int = 320,
    offset_ratio: Tuple[float, float] = (0.0, 0.0),
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray, np.ndarray]:
    """Square crop around the mask bbox, resized to output_size.

    Reference `patch_crop` (`preprocess.py:181-254`): bbox of mask, margin,
    square aspect, bilinear image / nearest depth resize, K updated.
    Returns (image, depth, mask, K_new).
    """
    import cv2

    ys, xs = np.nonzero(mask)
    h, w = mask.shape[:2]
    if len(xs) == 0:
        x0, y0, x1, y1 = 0, 0, w - 1, h - 1
    else:
        x0, y0, x1, y1 = xs.min(), ys.min(), xs.max(), ys.max()
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
    half = max(x1 - x0, y1 - y0) / 2.0 * (1.0 + margin_ratio)
    half = max(half, 8.0)
    cx += offset_ratio[0] * half
    cy += offset_ratio[1] * half

    sx0, sy0 = cx - half, cy - half
    s = output_size / (2.0 * half)

    M = np.asarray([[s, 0.0, -sx0 * s], [0.0, s, -sy0 * s]], np.float32)
    img_c = cv2.warpAffine(
        image, M, (output_size, output_size), flags=cv2.INTER_LINEAR
    )
    depth_c = (
        cv2.warpAffine(depth, M, (output_size, output_size), flags=cv2.INTER_NEAREST)
        if depth is not None
        else None
    )
    mask_c = cv2.warpAffine(
        mask.astype(np.uint8), M, (output_size, output_size),
        flags=cv2.INTER_NEAREST,
    ).astype(bool)

    K_new = K.copy().astype(np.float32)
    K_new[0, 0] *= s
    K_new[1, 1] *= s
    K_new[0, 2] = (K[0, 2] - sx0) * s
    K_new[1, 2] = (K[1, 2] - sy0) * s
    return img_c, depth_c, mask_c, K_new


def mask_depth_to_points(
    depth: np.ndarray, K: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Lift nonzero depth pixels to camera-frame points.

    Returns (points (M, 3), pixel coords (M, 2) as (x, y)).
    """
    ys, xs = np.nonzero(depth > 0)
    z = depth[ys, xs]
    x = (xs - K[0, 2]) / K[0, 0] * z
    y = (ys - K[1, 2]) / K[1, 1] * z
    return (
        np.stack([x, y, z], axis=-1).astype(np.float32),
        np.stack([xs, ys], axis=-1).astype(np.int64),
    )


def lift_to_model_frame(
    pts_cam: np.ndarray, RT_norm: np.ndarray, scale: float
) -> np.ndarray:
    """Camera points -> normalized model frame: R^T (X - t') / s
    (reference `preprocess.py:464-469`)."""
    return ((RT_norm[:, :3].T @ (pts_cam.T - RT_norm[:, 3:])).T / scale).astype(
        np.float32
    )


def get_correspondences(
    lifted: np.ndarray, model: np.ndarray, radius: float, k: int = 5
) -> np.ndarray:
    """(N_l, 3) x (N_m, 3) -> (P, 2) [lifted_idx, model_idx] pairs within
    radius, up to k per lifted point (reference `preprocess.py:84-100`)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(model)
    # workers=-1: the query releases the GIL and fans out over host cores.
    _, idxs = tree.query(
        lifted, k=k, distance_upper_bound=radius, workers=-1
    )
    if k == 1:
        idxs = idxs[:, None]
    # Misses are reported as idx == n_model (dist inf); row-major nonzero
    # preserves the (i, then j) pair order of the original Python loop.
    li, kj = np.nonzero(idxs < len(model))
    return np.stack(
        [li, idxs[li, kj]], axis=-1
    ).astype(np.int64).reshape(-1, 2)


def build_correspondence_set(
    lifted_points: np.ndarray,     # (M, 3) normalized model frame
    lifted_px: np.ndarray,         # (M, 2) pixel coords
    model_points: np.ndarray,      # (N, 3) normalized
    pairs: np.ndarray,             # (P, 2) [lifted_idx, model_idx]
    depth_mask: np.ndarray,        # (H, W) bool fg mask
    cfg: PreprocessConfig,
    rs: np.random.RandomState,
) -> CorrespondenceSet:
    """Sample a fixed-size correspondence set incl. background rows.

    Mirrors `model/RNNPose.py:242-270`: subsample pairs to max_points,
    append ~10% background-pixel rows with 1e6 sentinel coordinates (bg
    descriptors cluster together and repel the model descriptors).
    Single-sample (no batch dim) — the collate stacks.
    """
    P = cfg.num_corr
    n_bg = max(1, int(P * cfg.bg_fraction))
    n_fg = P - n_bg

    if len(pairs) < cfg.min_correspondences:
        raise TooFewCorrespondences(f"only {len(pairs)} pairs")

    sel = rs.permutation(len(pairs))[:n_fg]
    pairs_sel = pairs[sel]
    n_real_fg = len(pairs_sel)

    px = np.zeros((P, 2), np.int64)
    src_pts = np.full((P, 3), 1e6, np.float32)
    tgt_pts = np.full((P, 3), 1e6, np.float32)
    model_idx = np.zeros((P,), np.int64)
    is_bg = np.ones((P,), np.float32)
    valid = np.zeros((P,), np.float32)

    px[:n_real_fg] = lifted_px[pairs_sel[:, 0]]
    src_pts[:n_real_fg] = lifted_points[pairs_sel[:, 0]]
    tgt_pts[:n_real_fg] = model_points[pairs_sel[:, 1]]
    model_idx[:n_real_fg] = pairs_sel[:, 1]
    is_bg[:n_real_fg] = 0.0
    valid[:n_real_fg] = 1.0

    bg_ys, bg_xs = np.nonzero(~depth_mask)
    if len(bg_xs) > 0:
        bsel = rs.randint(0, len(bg_xs), size=n_bg)
        px[n_fg:] = np.stack([bg_xs[bsel], bg_ys[bsel]], axis=-1)
        valid[n_fg:] = 1.0
    return CorrespondenceSet(
        px=px, src_pts=src_pts, tgt_pts=tgt_pts,
        model_idx=model_idx, is_bg=is_bg, valid=valid,
    )
