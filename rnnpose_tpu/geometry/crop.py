"""In-graph object-centric zoom-crop, reference-exact.

The reference computes the zoom-crop affine on the host with OpenCV
(`model/PoseRefiner.py:145-218`: splatted point-cloud mask -> integer bbox ->
cv2.getAffineTransform -> F.affine_grid/grid_sample), forcing a GPU->CPU sync
every render iteration. Here the whole thing is expressed in-graph with
static shapes — but with the reference's exact numeric conventions, verified
activation-for-activation against the torch code in
`tests/test_dress_rehearsal.py`:

  * the crop window is centered on the *projected model-frame origin*
    (`PoseRefiner.py:207-210`), not the bbox center;
  * the window size comes from the max distance from that center to the
    (integer, splat-quantized) mask bbox, scaled by 2*(1+margin), with the
    full-image aspect ratio H/W making the source window anisotropic
    (`PoseRefiner.py:145-205`: crop_height vs crop_width = crop_height/ratio);
  * crop intrinsics use the pixel-corner (S-1) affine
    (`get_affine_transformation` with output pts [[0,0],[0,S-1],[S-1,0]],
    `PoseRefiner.py:188-216`);
  * image resampling follows `F.affine_grid`+`grid_sample` with
    align_corners=False: output pixel i samples source
    u = (c - half - 0.5) + (i + 0.5) * (2*half / S).

Convention: a crop is parameterized by (cx, cy, half_x, half_y) — center and
half-sides of the source window [cx +- half_x] x [cy +- half_y], mapped onto
an out_size x out_size target.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import projective as proj

__all__ = [
    "mask_bbox",
    "square_crop_params",
    "reference_crop_params",
    "crop_intrinsics",
    "crop_source_coords",
    "mask_zoom_crop_params",
]

_BIG = 1e9


def mask_bbox(mask: jnp.ndarray) -> jnp.ndarray:
    """Bounding box of nonzero pixels per batch element.

    Args:
      mask: (B, H, W) float or bool.
    Returns:
      (B, 4) [x0, y0, x1, y1] (inclusive). If the mask is empty the full
      image box is returned — keeps downstream math finite.
    """
    h, w = mask.shape[-2], mask.shape[-1]
    m = mask > 0
    grid = proj.coords_grid(h, w)  # (H, W, 2)
    gx, gy = grid[..., 0], grid[..., 1]
    x0 = jnp.min(jnp.where(m, gx, _BIG), axis=(-2, -1))
    y0 = jnp.min(jnp.where(m, gy, _BIG), axis=(-2, -1))
    x1 = jnp.max(jnp.where(m, gx, -_BIG), axis=(-2, -1))
    y1 = jnp.max(jnp.where(m, gy, -_BIG), axis=(-2, -1))
    empty = ~jnp.any(m, axis=(-2, -1))
    x0 = jnp.where(empty, 0.0, x0)
    y0 = jnp.where(empty, 0.0, y0)
    x1 = jnp.where(empty, float(w - 1), x1)
    y1 = jnp.where(empty, float(h - 1), y1)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def square_crop_params(bbox: jnp.ndarray, margin: float = 0.4) -> jnp.ndarray:
    """Square crop window around a bbox center with relative margin.

    A simpler bbox-centered variant (kept for tools/tests); the model path
    uses `reference_crop_params`.
    Args:
      bbox: (B, 4) [x0, y0, x1, y1].
    Returns:
      (B, 4) [cx, cy, half_x, half_y] with half_x == half_y.
    """
    cx = (bbox[..., 0] + bbox[..., 2]) * 0.5
    cy = (bbox[..., 1] + bbox[..., 3]) * 0.5
    half = jnp.maximum(bbox[..., 2] - bbox[..., 0], bbox[..., 3] - bbox[..., 1])
    half = half * 0.5 * (1.0 + margin)
    half = jnp.maximum(half, 1.0)
    return jnp.stack([cx, cy, half, half], axis=-1)


def reference_crop_params(
    center: jnp.ndarray,
    bbox: jnp.ndarray,
    margin: float = 0.4,
    ratio: float = 1.0,
) -> jnp.ndarray:
    """The reference's zoom-crop window (`PoseRefiner.py:145-218`).

    Args:
      center: (B, 2) crop center — the projected model-frame origin
        K @ T[:, :3, 3] (`PoseRefiner.py:209-210`).
      bbox: (B, 4) [x0, y0, x1, y1] of the foreground mask, already
        splat-quantized to integers (see `PoseRefiner` call site).
      margin: relative margin (reference margin_ratio=0.4).
      ratio: full-image aspect H/W (`get_affine_transformation:147`).
    Returns:
      (B, 4) [cx, cy, half_x, half_y].
    """
    left = center[..., 0] - bbox[..., 0]
    right = bbox[..., 2] - center[..., 0]
    up = center[..., 1] - bbox[..., 1]
    down = bbox[..., 3] - center[..., 1]
    crop_height = (
        jnp.maximum(
            jnp.maximum(ratio * right, ratio * left), jnp.maximum(up, down)
        )
        * 2.0
        * (1.0 + margin)
    )
    half_y = jnp.maximum(crop_height * 0.5, 1.0)
    half_x = half_y / ratio
    return jnp.stack([center[..., 0], center[..., 1], half_x, half_y], axis=-1)


def mask_zoom_crop_params(mask: jnp.ndarray, margin: float = 0.4) -> jnp.ndarray:
    """mask (B, H, W) -> (B, 4) [cx, cy, half_x, half_y]."""
    return square_crop_params(mask_bbox(mask), margin)


def crop_intrinsics(
    intrinsics: jnp.ndarray, crop_params: jnp.ndarray, out_size: int
) -> jnp.ndarray:
    """Intrinsics of the virtual zoomed-in camera.

    Reference `gen_zoom_crop_grids` (`PoseRefiner.py:207-218`): the affine
    maps output pixel corners [0, S-1] onto the window edges [c-h, c+h], so
    u' = (u - (cx - half_x)) * (S-1) / (2*half_x) — note S-1, not S.
    Args:
      intrinsics: (B, 4) [fx, fy, cx, cy].
      crop_params: (B, 4) [ccx, ccy, half_x, half_y].
    Returns:
      (B, 4) cropped intrinsics.
    """
    sx = (out_size - 1) / (2.0 * crop_params[..., 2])
    sy = (out_size - 1) / (2.0 * crop_params[..., 3])
    fx = intrinsics[..., 0] * sx
    fy = intrinsics[..., 1] * sy
    cx = (intrinsics[..., 2] - (crop_params[..., 0] - crop_params[..., 2])) * sx
    cy = (intrinsics[..., 3] - (crop_params[..., 1] - crop_params[..., 3])) * sy
    return jnp.stack([fx, fy, cx, cy], axis=-1)


def crop_source_coords(crop_params: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Source-image pixel coords for every crop pixel (for bilinear warping).

    Reference semantics: `F.affine_grid` + `grid_sample` with
    align_corners=False (`PoseRefiner.py:176-184,214,287`): output pixel i
    samples source u = (c - half - 0.5) + (i + 0.5) * (2*half / S).
    Args:
      crop_params: (B, 4) [cx, cy, half_x, half_y].
    Returns:
      (B, out_size, out_size, 2) source (x, y) coords.
    """
    grid = proj.coords_grid(out_size, out_size)  # (S, S, 2)
    s = (2.0 * crop_params[..., 2:4]) / out_size           # (B, 2)
    origin = crop_params[..., :2] - crop_params[..., 2:4]  # (B, 2)
    return (
        (grid[None] + 0.5) * s[:, None, None, :]
        + origin[:, None, None, :]
        - 0.5
    )
