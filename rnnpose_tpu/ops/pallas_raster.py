"""Pallas TPU kernel for the z-buffer resolve of the rasterizer.

The pure-JAX rasterizer (`render/raster.py`) expresses the face/pixel sweep
as a `lax.scan` of matmuls — correct, but XLA materializes (P, C) candidate
arrays in HBM between scan steps. This kernel keeps the whole sweep on-chip:

  grid = (pixel row-tiles, face chunks); each invocation evaluates the three
  edge functions + affine depth of `chunk` faces at a (rows x W) pixel tile
  entirely in VMEM/registers (VPU fma chains over a (rows*W, chunk) block),
  reduces to the per-pixel nearest face of the chunk, and merges into the
  output block, which is revisited across the chunk axis (TPU grids execute
  sequentially, so read-modify-write accumulation on the same out block is
  well-defined).

HBM traffic: face data (F x 16 floats) once per pixel-tile + the (H, W)
z/fid outputs — no (P, F) intermediates. The arithmetic is the same as the
scan version, so speed-of-light is VPU-bound at ~P*F*16 flops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["zbuffer_sweep"]

_FAR = 1e9


def _kernel(face_ref, z_ref, fid_ref, *, rows: int, width: int, chunk: int,
            num_chunks: int, min_depth: float):
    i = pl.program_id(0)

    # Pixel coordinates of this tile (centers at +0.5).
    n = rows * width
    lin = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x = (lin % width).astype(jnp.float32) + 0.5       # (n, 1)
    y = (lin // width + i * rows).astype(jnp.float32) + 0.5

    def body(j, carry):
        best_z, best_f = carry
        fd = face_ref[pl.ds(j * chunk, chunk), :]     # (chunk, 16)

        def edge(k):
            a = fd[:, 3 * k][None, :]                 # (1, chunk)
            b = fd[:, 3 * k + 1][None, :]
            c = fd[:, 3 * k + 2][None, :]
            return x * a + y * b + c                  # (n, chunk)

        e0, e1, e2 = edge(0), edge(1), edge(2)
        depth = (
            x * fd[:, 9][None, :] + y * fd[:, 10][None, :] + fd[:, 11][None, :]
        )
        ok = (
            (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
            & (depth > min_depth) & (fd[:, 12][None, :] > 0.0)
        )
        zcand = jnp.where(ok, depth, _FAR)            # (n, chunk)
        local_z = jnp.min(zcand, axis=1, keepdims=True)
        local_a = jnp.argmin(zcand, axis=1).astype(jnp.int32)[:, None]
        take = local_z < best_z
        best_z = jnp.where(take, local_z, best_z)
        best_f = jnp.where(take, j * chunk + local_a, best_f)
        return best_z, best_f

    init = (
        jnp.full((n, 1), _FAR, jnp.float32),
        jnp.full((n, 1), -1, jnp.int32),
    )
    best_z, best_f = jax.lax.fori_loop(0, num_chunks, body, init)
    best_f = jnp.where(best_z < _FAR, best_f, -1)
    z_ref[:] = best_z.reshape(rows, width)
    fid_ref[:] = best_f.reshape(rows, width)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "chunk", "rows", "min_depth", "interpret"),
)
def zbuffer_sweep(
    face_data: jnp.ndarray,
    h: int,
    w: int,
    chunk: int = 128,
    rows: int = 8,
    min_depth: float = 0.01,
    interpret: bool = False,
):
    """Nearest-face sweep.

    Args:
      face_data: (F, 16) float32 rows
        [a0,b0,c0, a1,b1,c1, a2,b2,c2, za,zb,zc, valid, pad, pad, pad]
        where e_k(x,y) = a_k x + b_k y + c_k are the area-normalized edge
        functions and depth(x,y) = za x + zb y + zc.
      h, w: raster size (h divisible by `rows`).
      chunk: faces per grid step (F divisible by chunk).
    Returns:
      (zbuf (h, w) f32 with FAR where empty, face_id (h, w) i32 with -1).
    """
    F = face_data.shape[0]
    assert F % chunk == 0 and h % rows == 0
    kernel = functools.partial(
        _kernel, rows=rows, width=w, chunk=chunk, num_chunks=F // chunk,
        min_depth=min_depth,
    )
    return pl.pallas_call(
        kernel,
        # Face data is tiny (F x 16 floats); keep it whole in VMEM and loop
        # chunks INSIDE the kernel — the grid has one step per pixel tile, so
        # per-invocation overhead is paid ~h/rows times, not (h/rows)*(F/chunk).
        grid=(h // rows,),
        in_specs=[
            pl.BlockSpec((F, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        interpret=interpret,
    )(face_data)
