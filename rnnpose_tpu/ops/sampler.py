"""Bilinear sampling (the TPU equivalent of `grid_sample` / RAFT's
`bilinear_sampler`, reference `thirdparty/raft/utils/utils.py:57-71`).

Implemented as gather + lerp in channel-last layout. XLA lowers the gathers
to efficient dynamic-slice batches on TPU; for the correlation-volume hot
path a fused Pallas kernel lives in `ops/corr.py`.

Convention: `coords` are *pixel* coordinates (x, y) — not normalized — with
zero-padding outside the image, matching the reference's
`padding_mode='zeros'` grid_sample wrapper.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bilinear_sample", "bilinear_sample_nchw"]


def bilinear_sample(image: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample `image` at fractional pixel coords with zero padding.

    Args:
      image: (B, H, W, C).
      coords: (B, ..., 2) pixel coords, channel order (x, y).
    Returns:
      (B, ..., C) sampled values.
    """
    B, H, W, C = image.shape
    out_shape = coords.shape[:-1] + (C,)
    coords = coords.reshape(B, -1, 2)

    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = image.reshape(B, H * W, C)
        idx = yc * W + xc  # (B, N)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(image.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)

    wx = wx[..., None].astype(image.dtype)
    wy = wy[..., None].astype(image.dtype)
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out.reshape(out_shape)


def bilinear_sample_nchw(image: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """NCHW convenience wrapper: image (B, C, H, W), coords (B, H', W', 2) ->
    (B, C, H', W')."""
    out = bilinear_sample(jnp.moveaxis(image, 1, -1), coords)
    return jnp.moveaxis(out, -1, 1)
