"""Flow upsampling ops.

`convex_upsample` is RAFT's learned 8x upsampling: each fine pixel is a
convex combination (predicted 9-way mask) of the 3x3 coarse neighborhood
(reference `model/CFNet.py:95-106` / `thirdparty/raft/update.py:178-188`).
`upflow8` is the plain bilinear fallback (`thirdparty/raft/utils/utils.py:80-86`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["convex_upsample", "upflow", "unfold3x3", "upsample2x_bilinear"]


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Extract 3x3 patches (zero padded): (B, H, W, C) -> (B, H, W, 9, C)."""
    pads = [(0, 0), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pads)
    shifts = []
    for dy in range(3):
        for dx in range(3):
            shifts.append(xp[:, dy : dy + x.shape[1], dx : dx + x.shape[2], :])
    return jnp.stack(shifts, axis=-2)


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Learned convex upsampling of a coarse flow field.

    Args:
      flow: (B, H, W, 2) coarse flow (1/factor resolution).
      mask: (B, H, W, 9 * factor * factor) unnormalized combination logits,
        laid out as (9, factor, factor) per coarse pixel like the reference's
        `mask.view(N, 1, 9, 8, 8, H, W)` (`CFNet.py:98`).
      factor: upsampling factor (8).
    Returns:
      (B, H*factor, W*factor, 2) upsampled flow, scaled by `factor`.
    """
    B, H, W, _ = flow.shape
    f = factor
    m = mask.reshape(B, H, W, 9, f, f)
    m = jax.nn.softmax(m, axis=3)
    patches = unfold3x3(flow * f)  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, patches)  # (B, H, W, f, f, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B, H, f, W, f, 2)
    return up.reshape(B, H * f, W * f, 2)


def upflow(flow: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Bilinear flow upsampling with magnitude rescale."""
    B, H, W, C = flow.shape
    out = jax.image.resize(flow, (B, H * factor, W * factor, C), "bilinear")
    return out * factor


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Exact `jax.image.resize(x, 2x, "bilinear")` as a fixed 4-tap stencil.

    XLA lowers `resize` to dense (2N, N) interpolation-matrix dot_generals —
    ~0.9 ms/frame at 320^2 x 256ch in the SuperPoint decoder. The aligned 2x
    case is a two-tap tent per axis (even out: 0.25 prev + 0.75 cur; odd:
    0.75 cur + 0.25 next; edges clamp), which is pure VPU shift/fma work.
    Verified elementwise-equal to `jax.image.resize`.
    """
    b, h, w, c = x.shape

    def up(a, axis):
        n = a.shape[axis]
        first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        last = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
        prev = jnp.concatenate(
            [first, jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)], axis
        )
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, n, axis=axis), last], axis
        )
        even = 0.25 * prev + 0.75 * a
        odd = 0.75 * a + 0.25 * nxt
        out = jnp.stack([even, odd], axis=axis + 1)
        return out.reshape(a.shape[:axis] + (2 * n,) + a.shape[axis + 1:])

    return up(up(x, 1), 2)
