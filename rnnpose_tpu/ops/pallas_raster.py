"""Pallas TPU kernels for the z-buffer resolve of the rasterizer.

Two kernels:

  * `zbuffer_sweep_tiled` — the production path: per-tile face-chunk
    culling + VMEM-resident running z-min (see the block comment below).
    4096 faces @ 240^2 in ~1 ms-class device time; exact f32 (bit-matches
    the CPU render up to edge ties).
  * `zbuffer_sweep` — the older brute-force kernel (every tile tests every
    face); VPU-compute-bound, kept for reference/regression comparison.

The pure-JAX rasterizer (`render/raster.py`) expresses the face/pixel sweep
as a `lax.scan` of matmuls — correct (with Precision.HIGHEST), but XLA
materializes (P, C) candidate arrays in HBM between scan steps. The
brute-force kernel keeps the sweep on-chip:

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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Read ONCE at import: trace-time env reads inside jitted functions are not
# part of the jit cache key, so post-compile changes would silently no-op.
# Measured full-model at B=8: VPU fma chains 124.1 fps vs MXU 108.9 — the
# K=3 exact-f32 contraction (6 MXU passes at HIGHEST) loses to the
# broadcast-fma sweep. The MXU variant stays selectable (set
# RNNPOSE_RASTER_SWEEP=mxu before importing) for hardware where it flips.
MXU_SWEEP = os.environ.get("RNNPOSE_RASTER_SWEEP", "vpu") == "mxu"

__all__ = [
    "zbuffer_sweep",
    "zbuffer_sweep_tiled",
    "zbuffer_sweep_tiled_attrs",
    "zbuffer_sweep_tiled_attrs_batched",
    "zbuffer_sweep_rows_attrs_batched",
]

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


# ---------------------------------------------------------------------------
# Tiled sweep with per-tile face-chunk culling.
#
# The brute-force sweep above is VPU-compute-bound: every pixel tile tests
# every face (P*F*~20 flops — ~6 GFLOP at 240^2/4096f, several ms at VPU
# rates). But a rasterized mesh is spatially local: a 16x16 pixel tile
# overlaps the screen bbox of only a small fraction of face chunks. So:
#
#   host (XLA) side: per-face screen bboxes -> conservative tile/chunk
#     overlap matrix (T, F/chunk) -> packed per-tile chunk-id lists + counts
#     (one tiny argsort; ~1% of the sweep's cost).
#   kernel: grid over pixel tiles; each invocation loops over ONLY its
#     overlapping chunks (dynamic trip count from scalar-prefetched counts),
#     evaluating edge functions + affine depth in VMEM and keeping the
#     running (z, face_id) minimum in registers.
#
# The bbox test is conservative, so the result is bit-comparable to the
# full sweep up to float-associativity in the edge/depth evaluation.
# ---------------------------------------------------------------------------


def _tiled_kernel(ids_ref, counts_ref, face_ref, z_ref, fid_ref, *,
                  tile: int, w_tiles: int, chunk: int, min_depth: float):
    t = pl.program_id(0)
    ty = t // w_tiles
    tx = t % w_tiles

    n = tile * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x = (lin % tile + tx * tile).astype(jnp.float32) + 0.5   # (n, 1)
    y = (lin // tile + ty * tile).astype(jnp.float32) + 0.5

    def body(j, carry):
        best_z, best_f = carry
        cid = ids_ref[t, j]
        fd = face_ref[cid]                                   # (16, chunk)
        e0 = x * fd[0:1, :] + y * fd[1:2, :] + fd[2:3, :]    # (n, chunk)
        e1 = x * fd[3:4, :] + y * fd[4:5, :] + fd[5:6, :]
        e2 = x * fd[6:7, :] + y * fd[7:8, :] + fd[8:9, :]
        depth = x * fd[9:10, :] + y * fd[10:11, :] + fd[11:12, :]
        ok = (
            (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
            & (depth > min_depth) & (fd[12:13, :] > 0.0)
        )
        zcand = jnp.where(ok, depth, _FAR)                   # (n, chunk)
        local_z = jnp.min(zcand, axis=1, keepdims=True)
        local_a = jnp.argmin(zcand, axis=1).astype(jnp.int32)[:, None]
        take = local_z < best_z
        best_z = jnp.where(take, local_z, best_z)
        best_f = jnp.where(take, cid * chunk + local_a, best_f)
        return best_z, best_f

    init = (
        jnp.full((n, 1), _FAR, jnp.float32),
        jnp.full((n, 1), -1, jnp.int32),
    )
    best_z, best_f = jax.lax.fori_loop(0, counts_ref[t], body, init)
    best_f = jnp.where(best_z < _FAR, best_f, -1)
    z_ref[:] = best_z.reshape(1, tile, tile)
    fid_ref[:] = best_f.reshape(1, tile, tile)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "chunk", "tile", "min_depth", "interpret"),
)
def zbuffer_sweep_tiled(
    face_data: jnp.ndarray,
    bbox: jnp.ndarray,
    h: int,
    w: int,
    chunk: int = 128,
    tile: int = 16,
    min_depth: float = 0.01,
    interpret: bool = False,
):
    """Nearest-face sweep with tile-level chunk culling.

    Args:
      face_data: (F, 16) float32 rows
        [a0,b0,c0, a1,b1,c1, a2,b2,c2, za,zb,zc, valid, pad, pad, pad]
        (same layout as `zbuffer_sweep`).
      bbox: (F, 4) float32 [x0, y0, x1, y1] screen-space bbox per face;
        invalid faces must carry an empty bbox (x0 > x1) so they cull away.
      h, w: raster size, divisible by `tile`.
      chunk: faces per culling granule (F divisible by chunk).
    Returns:
      (zbuf (h, w) f32 with FAR where empty, face_id (h, w) i32 with -1).
    """
    F = face_data.shape[0]
    assert F % chunk == 0 and h % tile == 0 and w % tile == 0
    nc = F // chunk
    h_tiles, w_tiles = h // tile, w // tile
    T = h_tiles * w_tiles

    # --- host-side (XLA) culling tables ---
    # Tile pixel-center extents.
    tyx = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tyx % w_tiles * tile).astype(jnp.float32) + 0.5   # (T,)
    ty0 = (tyx // w_tiles * tile).astype(jnp.float32) + 0.5
    tx1 = tx0 + (tile - 1)
    ty1 = ty0 + (tile - 1)
    overlap = (
        (bbox[None, :, 0] <= tx1[:, None])
        & (bbox[None, :, 2] >= tx0[:, None])
        & (bbox[None, :, 1] <= ty1[:, None])
        & (bbox[None, :, 3] >= ty0[:, None])
    )                                                        # (T, F)
    chunk_hit = jnp.any(overlap.reshape(T, nc, chunk), axis=-1)  # (T, nc)
    counts = jnp.sum(chunk_hit, axis=-1).astype(jnp.int32)   # (T,)
    # Packed ascending chunk ids: stable argsort of ~hit puts hits first in
    # index order (matching the full sweep's chunk visit order, so the
    # first-chunk-wins tie-breaking is identical).
    ids = jnp.argsort(~chunk_hit, axis=-1, stable=True).astype(jnp.int32)

    face_vmem = (
        face_data.reshape(nc, chunk, 16).transpose(0, 2, 1)  # (nc, 16, chunk)
    )

    kernel = functools.partial(
        _tiled_kernel, tile=tile, w_tiles=w_tiles, chunk=chunk,
        min_depth=min_depth,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (nc, 16, chunk), lambda t, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            # (1, tile, tile) blocks of a (T, tile, tile) array: TPU requires
            # the last two block dims be 8/128-divisible OR equal to the
            # array dims — tile-shaped trailing dims satisfy the latter. The
            # (h, w) raster is reassembled from tiles by XLA below.
            pl.BlockSpec(
                (1, tile, tile), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, tile), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    zt, ft = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, tile, tile), jnp.float32),
            jax.ShapeDtypeStruct((T, tile, tile), jnp.int32),
        ),
        interpret=interpret,
    )(ids, counts, face_vmem)

    def untile(a):
        return (
            a.reshape(h_tiles, w_tiles, tile, tile)
            .transpose(0, 2, 1, 3)
            .reshape(h, w)
        )

    return untile(zt), untile(ft)


# ---------------------------------------------------------------------------
# Tiled sweep + fused attribute interpolation.
#
# The z-buffer resolve above leaves attribute interpolation to XLA:
# `coef[fid]` + `attrs[faces][fid]` per-pixel gathers and a (P, 3)x(P, 3, D)
# contraction — measured ~4 ms/frame of gather-bound device time at 240^2
# (the single hottest group after the tile-culled kernel landed). But the
# kernel already knows each pixel's winning face AND the face's edge
# functionals are affine in (x, y), so both the barycentrics and the
# interpolated attributes can be recovered IN the kernel with one extra pass
# over the tile's candidate chunks:
#
#   onehot(n, chunk) = (best_face == chunk face ids)     — exact 0/1 matrix
#   coef9 (n, 9)     = onehot @ edge_coef.T              — MXU
#   corner (n, 3, D) = onehot @ corner_attrs.T           — MXU (3 dots)
#   bary_k(x, y)     = coef9 affine eval                 — VPU
#   attr             = sum_k bary_k * corner_k           — VPU
#
# Per-pixel random-access gathers never materialize; everything is matmul
# or fma-shaped. Attributes rendered this way are NOT differentiable (the
# whole fragment pass is stop-gradient) — use only for constant vertex
# attributes (RGB colors, camera-frame normals), which is exactly the
# reference's texture render (`diff_render_optim.py:201-244`).
# ---------------------------------------------------------------------------


def _tiled_attrs_kernel(ids_ref, counts_ref, face_ref, attr_ref,
                        z_ref, fid_ref, out_ref, *,
                        tile: int, w_tiles: int, chunk: int, dpad: int,
                        min_depth: float):
    t = pl.program_id(0)
    ty = t // w_tiles
    tx = t % w_tiles

    n = tile * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x = (lin % tile + tx * tile).astype(jnp.float32) + 0.5   # (n, 1)
    y = (lin // tile + ty * tile).astype(jnp.float32) + 0.5

    def body(j, carry):
        best_z, best_f = carry
        cid = ids_ref[t, j]
        fd = face_ref[cid]                                   # (16, chunk)
        e0 = x * fd[0:1, :] + y * fd[1:2, :] + fd[2:3, :]    # (n, chunk)
        e1 = x * fd[3:4, :] + y * fd[4:5, :] + fd[5:6, :]
        e2 = x * fd[6:7, :] + y * fd[7:8, :] + fd[8:9, :]
        depth = x * fd[9:10, :] + y * fd[10:11, :] + fd[11:12, :]
        ok = (
            (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
            & (depth > min_depth) & (fd[12:13, :] > 0.0)
        )
        zcand = jnp.where(ok, depth, _FAR)                   # (n, chunk)
        local_z = jnp.min(zcand, axis=1, keepdims=True)
        local_a = jnp.argmin(zcand, axis=1).astype(jnp.int32)[:, None]
        take = local_z < best_z
        best_z = jnp.where(take, local_z, best_z)
        best_f = jnp.where(take, cid * chunk + local_a, best_f)
        return best_z, best_f

    init = (
        jnp.full((n, 1), _FAR, jnp.float32),
        jnp.full((n, 1), -1, jnp.int32),
    )
    best_z, best_f = jax.lax.fori_loop(0, counts_ref[t], body, init)
    best_f = jnp.where(best_z < _FAR, best_f, -1)

    # Second pass: recover the winner's edge coefficients + corner attributes
    # via exact one-hot matmuls (each winner lives in exactly one chunk, so
    # accumulation over chunks is a disjoint sum). Unconditional traversal of
    # the same bbox-candidate list as the sweep: a per-chunk lax.cond skip on
    # the winner-id range was measured SLOWER (75.1 vs 78.6 fps full-model)
    # — the scalar/vector sync outweighs the skipped small matmuls.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    hp = jax.lax.Precision.HIGHEST

    def body2(j, acc):
        cid = ids_ref[t, j]
        coef_acc, c0_acc, c1_acc, c2_acc = acc
        fd = face_ref[cid]                                   # (16, chunk)
        ad = attr_ref[cid]                                   # (3, dpad, chunk)
        onehot = (best_f == cid * chunk + col).astype(jnp.float32)
        coef_acc = coef_acc + jax.lax.dot_general(
            onehot, fd[0:9, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )                                                    # (n, 9)
        c0_acc = c0_acc + jax.lax.dot_general(
            onehot, ad[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )                                                    # (n, dpad)
        c1_acc = c1_acc + jax.lax.dot_general(
            onehot, ad[1], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )
        c2_acc = c2_acc + jax.lax.dot_general(
            onehot, ad[2], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )
        return coef_acc, c0_acc, c1_acc, c2_acc

    coef9, c0, c1, c2 = jax.lax.fori_loop(
        0, counts_ref[t], body2,
        (
            jnp.zeros((n, 9), jnp.float32),
            jnp.zeros((n, dpad), jnp.float32),
            jnp.zeros((n, dpad), jnp.float32),
            jnp.zeros((n, dpad), jnp.float32),
        ),
    )
    b0 = x * coef9[:, 0:1] + y * coef9[:, 1:2] + coef9[:, 2:3]  # (n, 1)
    b1 = x * coef9[:, 3:4] + y * coef9[:, 4:5] + coef9[:, 5:6]
    b2 = x * coef9[:, 6:7] + y * coef9[:, 7:8] + coef9[:, 8:9]
    attr = b0 * c0 + b1 * c1 + b2 * c2                       # (n, dpad)

    z_ref[:] = best_z.reshape(1, tile, tile)
    fid_ref[:] = best_f.reshape(1, tile, tile)
    out_ref[:] = attr.reshape(1, tile, tile, dpad)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "chunk", "tile", "min_depth", "interpret"),
)
def zbuffer_sweep_tiled_attrs(
    face_data: jnp.ndarray,
    bbox: jnp.ndarray,
    corner_attrs: jnp.ndarray,
    h: int,
    w: int,
    chunk: int = 128,
    tile: int = 16,
    min_depth: float = 0.01,
    interpret: bool = False,
):
    """Tile-culled nearest-face sweep with fused attribute interpolation.

    Args:
      face_data: (F, 16) float32 — layout as `zbuffer_sweep` (the first 9
        columns must be the area-normalized edge coefficients, so their
        affine evaluation at a pixel IS the barycentric weight).
      bbox: (F, 4) float32 [x0, y0, x1, y1] per-face screen bbox.
      corner_attrs: (F, 3, D) float32 per-face-corner attribute values.
      h, w: raster size, divisible by `tile`.
    Returns:
      (zbuf (h, w) f32 FAR where empty, face_id (h, w) i32 -1 where empty,
       attrs (h, w, D) f32 zeros where empty).
    """
    F = face_data.shape[0]
    D = corner_attrs.shape[-1]
    assert F % chunk == 0 and h % tile == 0 and w % tile == 0
    nc = F // chunk
    h_tiles, w_tiles = h // tile, w // tile
    T = h_tiles * w_tiles
    dpad = max(8, -(-D // 8) * 8)

    tyx = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tyx % w_tiles * tile).astype(jnp.float32) + 0.5
    ty0 = (tyx // w_tiles * tile).astype(jnp.float32) + 0.5
    tx1 = tx0 + (tile - 1)
    ty1 = ty0 + (tile - 1)
    overlap = (
        (bbox[None, :, 0] <= tx1[:, None])
        & (bbox[None, :, 2] >= tx0[:, None])
        & (bbox[None, :, 1] <= ty1[:, None])
        & (bbox[None, :, 3] >= ty0[:, None])
    )
    chunk_hit = jnp.any(overlap.reshape(T, nc, chunk), axis=-1)
    counts = jnp.sum(chunk_hit, axis=-1).astype(jnp.int32)
    ids = jnp.argsort(~chunk_hit, axis=-1, stable=True).astype(jnp.int32)

    face_vmem = face_data.reshape(nc, chunk, 16).transpose(0, 2, 1)
    attr_pad = jnp.pad(corner_attrs, ((0, 0), (0, 0), (0, dpad - D)))
    attr_vmem = (
        attr_pad.reshape(nc, chunk, 3, dpad).transpose(0, 2, 3, 1)
    )  # (nc, 3, dpad, chunk)

    kernel = functools.partial(
        _tiled_attrs_kernel, tile=tile, w_tiles=w_tiles, chunk=chunk,
        dpad=dpad, min_depth=min_depth,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (nc, 16, chunk), lambda t, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nc, 3, dpad, chunk), lambda t, *_: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile, tile), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, tile), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, tile, dpad), lambda t, *_: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    zt, ft, at = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, tile, tile), jnp.float32),
            jax.ShapeDtypeStruct((T, tile, tile), jnp.int32),
            jax.ShapeDtypeStruct((T, tile, tile, dpad), jnp.float32),
        ),
        interpret=interpret,
    )(ids, counts, face_vmem, attr_vmem)

    def untile(a):
        return (
            a.reshape(h_tiles, w_tiles, tile, tile)
            .transpose(0, 2, 1, 3)
            .reshape(h, w)
        )

    attrs = (
        at.reshape(h_tiles, w_tiles, tile, tile, dpad)
        .transpose(0, 2, 1, 3, 4)
        .reshape(h, w, dpad)[..., :D]
    )
    return untile(zt), untile(ft), attrs


def _tiled_attrs_kernel_batched(ids_ref, counts_ref, face_mxu_ref, face_ref,
                                attr_ref, z_ref, fid_ref, out_ref, *,
                                tile: int, w_tiles: int, chunk: int,
                                dpad: int, min_depth: float,
                                mxu_sweep: bool):
    # ids/counts arrive as per-batch SMEM blocks (NOT scalar prefetch): the
    # block index maps never depend on them, and whole-array scalar prefetch
    # is (B*T*nc) i32 of SMEM residency — 1.9 MB > the 1 MB SMEM at B=16 on
    # the 16384-face LINEMOD pad. Per-b blocks keep SMEM O(T*nc), batch-free.
    # (ids_ref: (1, T, nc); counts_ref: (1, 1, T).)
    t = pl.program_id(1)
    ty = t // w_tiles
    tx = t % w_tiles

    n = tile * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x = (lin % tile + tx * tile).astype(jnp.float32) + 0.5
    y = (lin // tile + ty * tile).astype(jnp.float32) + 0.5
    hp0 = jax.lax.Precision.HIGHEST
    if mxu_sweep:
        pixh = jnp.concatenate([x, y, jnp.ones_like(x)], axis=1)  # (n, 3)

    def body(j, carry):
        best_z, best_f = carry
        cid = ids_ref[0, t, j]
        if mxu_sweep:
            # All four affine functionals of the chunk's faces at all tile
            # pixels as ONE exact-f32 MXU contraction (K=3): replaces ~12
            # VPU broadcast-fma chains over (n, chunk) — the sweep was
            # VPU-bound.
            W = face_mxu_ref[0, cid]                         # (4, 4*chunk)
            out = jax.lax.dot_general(
                pixh, W[0:3],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp0,
            )                                                # (n, 4*chunk)
            e0 = out[:, :chunk]
            e1 = out[:, chunk:2 * chunk]
            e2 = out[:, 2 * chunk:3 * chunk]
            depth = out[:, 3 * chunk:]
            vrow = W[3:4, :chunk]
        else:
            fd = face_ref[0, cid]                            # (16, chunk)
            e0 = x * fd[0:1, :] + y * fd[1:2, :] + fd[2:3, :]
            e1 = x * fd[3:4, :] + y * fd[4:5, :] + fd[5:6, :]
            e2 = x * fd[6:7, :] + y * fd[7:8, :] + fd[8:9, :]
            depth = x * fd[9:10, :] + y * fd[10:11, :] + fd[11:12, :]
            vrow = fd[12:13, :]
        ok = (
            (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
            & (depth > min_depth) & (vrow > 0.0)
        )
        zcand = jnp.where(ok, depth, _FAR)
        local_z = jnp.min(zcand, axis=1, keepdims=True)
        local_a = jnp.argmin(zcand, axis=1).astype(jnp.int32)[:, None]
        take = local_z < best_z
        best_z = jnp.where(take, local_z, best_z)
        best_f = jnp.where(take, cid * chunk + local_a, best_f)
        return best_z, best_f

    init = (
        jnp.full((n, 1), _FAR, jnp.float32),
        jnp.full((n, 1), -1, jnp.int32),
    )
    best_z, best_f = jax.lax.fori_loop(0, counts_ref[0, 0, t], body, init)
    best_f = jnp.where(best_z < _FAR, best_f, -1)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    hp = jax.lax.Precision.HIGHEST

    def body2(j, acc):
        cid = ids_ref[0, t, j]
        coef_acc, c0_acc, c1_acc, c2_acc = acc
        fd = face_ref[0, cid]
        ad = attr_ref[0, cid]                                # (3, dpad, chunk)
        onehot = (best_f == cid * chunk + col).astype(jnp.float32)
        coef_acc = coef_acc + jax.lax.dot_general(
            onehot, fd[0:9, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )
        c0_acc = c0_acc + jax.lax.dot_general(
            onehot, ad[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )
        c1_acc = c1_acc + jax.lax.dot_general(
            onehot, ad[1], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )
        c2_acc = c2_acc + jax.lax.dot_general(
            onehot, ad[2], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )
        return coef_acc, c0_acc, c1_acc, c2_acc

    coef9, c0, c1, c2 = jax.lax.fori_loop(
        0, counts_ref[0, 0, t], body2,
        (
            jnp.zeros((n, 9), jnp.float32),
            jnp.zeros((n, dpad), jnp.float32),
            jnp.zeros((n, dpad), jnp.float32),
            jnp.zeros((n, dpad), jnp.float32),
        ),
    )
    b0 = x * coef9[:, 0:1] + y * coef9[:, 1:2] + coef9[:, 2:3]
    b1 = x * coef9[:, 3:4] + y * coef9[:, 4:5] + coef9[:, 5:6]
    b2 = x * coef9[:, 6:7] + y * coef9[:, 7:8] + coef9[:, 8:9]
    attr = b0 * c0 + b1 * c1 + b2 * c2

    z_ref[:] = best_z.reshape(1, 1, tile, tile)
    fid_ref[:] = best_f.reshape(1, 1, tile, tile)
    out_ref[:] = attr.reshape(1, 1, tile, tile, dpad)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "chunk", "tile", "min_depth", "interpret"),
)
def zbuffer_sweep_tiled_attrs_batched(
    face_data: jnp.ndarray,
    bbox: jnp.ndarray,
    corner_attrs: jnp.ndarray,
    h: int,
    w: int,
    chunk: int = 128,
    tile: int = 16,
    min_depth: float = 0.01,
    interpret: bool = False,
):
    """Batched `zbuffer_sweep_tiled_attrs`: one kernel over a (B, tiles)
    grid instead of B serial kernel launches (the tiled kernel does not
    vmap; at B=8 the per-launch overhead dominated the raster cost). The
    cull tables ride per-(b, t) SMEM blocks, so SMEM stays O(nc) and the
    batch axis is bounded by VMEM/HBM, not the 1 MB SMEM (B=16 at the
    16384-face pad used to overflow scalar prefetch).

    Args: as the unbatched version but with a leading batch axis:
      face_data (B, F, 16), bbox (B, F, 4), corner_attrs (B, F, 3, D).
    Returns:
      (zbuf (B, h, w), face_id (B, h, w), attrs (B, h, w, D)).
    """
    B, F = face_data.shape[:2]
    D = corner_attrs.shape[-1]
    assert F % chunk == 0 and h % tile == 0 and w % tile == 0
    nc = F // chunk
    h_tiles, w_tiles = h // tile, w // tile
    T = h_tiles * w_tiles
    dpad = max(8, -(-D // 8) * 8)

    tyx = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tyx % w_tiles * tile).astype(jnp.float32) + 0.5
    ty0 = (tyx // w_tiles * tile).astype(jnp.float32) + 0.5
    tx1 = tx0 + (tile - 1)
    ty1 = ty0 + (tile - 1)
    overlap = (
        (bbox[:, None, :, 0] <= tx1[None, :, None])
        & (bbox[:, None, :, 2] >= tx0[None, :, None])
        & (bbox[:, None, :, 1] <= ty1[None, :, None])
        & (bbox[:, None, :, 3] >= ty0[None, :, None])
    )                                                        # (B, T, F)
    chunk_hit = jnp.any(overlap.reshape(B, T, nc, chunk), axis=-1)
    counts = jnp.sum(chunk_hit, axis=-1).astype(jnp.int32)   # (B, T)
    ids = jnp.argsort(~chunk_hit, axis=-1, stable=True).astype(jnp.int32)

    face_vmem = face_data.reshape(B, nc, chunk, 16).transpose(0, 1, 3, 2)
    # MXU sweep layout: rows are the x / y / 1 coefficients of the four
    # affine functionals [e0 | e1 | e2 | depth], row 3 carries validity.
    fdc = face_data.reshape(B, nc, chunk, 16)
    face_mxu = jnp.stack(
        [
            jnp.concatenate(
                [fdc[..., 0], fdc[..., 3], fdc[..., 6], fdc[..., 9]], -1
            ),
            jnp.concatenate(
                [fdc[..., 1], fdc[..., 4], fdc[..., 7], fdc[..., 10]], -1
            ),
            jnp.concatenate(
                [fdc[..., 2], fdc[..., 5], fdc[..., 8], fdc[..., 11]], -1
            ),
            jnp.tile(fdc[..., 12], (1, 1, 4)),
        ],
        axis=2,
    )  # (B, nc, 4, 4*chunk)
    attr_pad = jnp.pad(corner_attrs, ((0, 0), (0, 0), (0, 0), (0, dpad - D)))
    attr_vmem = (
        attr_pad.reshape(B, nc, chunk, 3, dpad).transpose(0, 1, 3, 4, 2)
    )  # (B, nc, 3, dpad, chunk)

    kernel = functools.partial(
        _tiled_attrs_kernel_batched, tile=tile, w_tiles=w_tiles, chunk=chunk,
        dpad=dpad, min_depth=min_depth, mxu_sweep=MXU_SWEEP,
    )
    zt, ft, at = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(
                (1, T, nc), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, T), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, nc, 4, 4 * chunk), lambda b, t: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nc, 16, chunk), lambda b, t: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nc, 3, dpad, chunk), lambda b, t: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, tile, tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile, tile), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile, tile, dpad), lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, T, tile, tile), jnp.float32),
            jax.ShapeDtypeStruct((B, T, tile, tile), jnp.int32),
            jax.ShapeDtypeStruct((B, T, tile, tile, dpad), jnp.float32),
        ),
        interpret=interpret,
    )(ids, counts[:, None, :], face_mxu, face_vmem, attr_vmem)

    def untile(a):
        return (
            a.reshape(B, h_tiles, w_tiles, tile, tile)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, h, w)
        )

    attrs = (
        at.reshape(B, h_tiles, w_tiles, tile, tile, dpad)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, h, w, dpad)[..., :D]
    )
    return untile(zt), untile(ft), attrs


# ---------------------------------------------------------------------------
# Row-granularity batched sweep.
#
# Cull-efficiency measurement at the shipping operating point (240^2 crop,
# 4096-face Morton-ordered mesh) showed the per-(batch, tile) kernel above is
# dominated by per-invocation FIXED cost, not sweep arithmetic: the mean tile
# sweeps only ~1.5 of 32 chunks and 72% of tiles sweep ZERO (the object
# covers a fraction of the crop), yet all B*225 invocations pay grid
# sequencing + two dynamic-trip loops + block copy-out (~4 us each — the
# 11M surviving pixel/face pairs are only ~0.06 ms of VPU fma work).
#
# This variant keeps the 16-px culling granularity but runs ONE invocation
# per (batch, 16-px tile ROW): a static inner loop walks the row's tiles,
# each sweeping only its own culled chunk list, and tiles with an empty list
# skip both passes entirely (@pl.when), writing background directly. That
# divides the invocation count by w/tile (15x at 240) and — because the
# output block is a (tile, w) row slab — the (B, ht, tile, w) output
# reassembles into image layout with a pure reshape: the ~1.6 ms/fwd of
# tile->image transpose copies (BENCHLOG round-3 'known non-wins') vanish,
# legally this time (trailing block dims equal the array dims).
# ---------------------------------------------------------------------------


def _rows_attrs_kernel_batched(ids_ref, counts_ref, face_ref, rec_ref,
                               z_ref, fid_ref, out_ref, *,
                               tile: int, w_tiles: int, chunk: int,
                               dpad: int, rows_per: int, min_depth: float):
    rg0 = pl.program_id(1) * rows_per

    n = tile * tile
    lin = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    xloc = (lin % tile).astype(jnp.float32) + 0.5
    yloc = (lin // tile).astype(jnp.float32) + 0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    hp = jax.lax.Precision.HIGHEST

    # Rows ride a DYNAMIC loop (dynamic sublane index into the out blocks):
    # unrolling rows_per * w_tiles tile bodies overflows Mosaic's scoped
    # VMEM (register spills scale with unrolled code size) — the row loop
    # keeps the body one row wide; only the lane-offset tile loop (static
    # slices) unrolls.
    def row_body(rg, _):
        y = yloc + (rg0 + rg).astype(jnp.float32) * tile
        for tx in range(w_tiles):
            t = (rg0 + rg) * w_tiles + tx
            cnt = counts_ref[0, 0, t]
            x = xloc + float(tx * tile)
            sl = slice(tx * tile, (tx + 1) * tile)

            @pl.when(cnt == 0)
            def _():
                z_ref[0, rg, :, sl] = jnp.full(
                    (tile, tile), _FAR, jnp.float32
                )
                fid_ref[0, rg, :, sl] = jnp.full((tile, tile), -1, jnp.int32)
                out_ref[0, rg, :, sl, :] = jnp.zeros(
                    (tile, tile, dpad), jnp.float32
                )

            @pl.when(cnt > 0)
            def _():
                def body(j, carry):
                    best_z, best_f = carry
                    cid = ids_ref[0, t, j]
                    fd = face_ref[0, cid]                    # (16, chunk)
                    e0 = x * fd[0:1, :] + y * fd[1:2, :] + fd[2:3, :]
                    e1 = x * fd[3:4, :] + y * fd[4:5, :] + fd[5:6, :]
                    e2 = x * fd[6:7, :] + y * fd[7:8, :] + fd[8:9, :]
                    depth = (
                        x * fd[9:10, :] + y * fd[10:11, :] + fd[11:12, :]
                    )
                    ok = (
                        (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                        & (depth > min_depth) & (fd[12:13, :] > 0.0)
                    )
                    zcand = jnp.where(ok, depth, _FAR)
                    local_z = jnp.min(zcand, axis=1, keepdims=True)
                    local_a = (
                        jnp.argmin(zcand, axis=1).astype(jnp.int32)[:, None]
                    )
                    take = local_z < best_z
                    best_z = jnp.where(take, local_z, best_z)
                    best_f = jnp.where(take, cid * chunk + local_a, best_f)
                    return best_z, best_f

                init = (
                    jnp.full((n, 1), _FAR, jnp.float32),
                    jnp.full((n, 1), -1, jnp.int32),
                )
                best_z, best_f = jax.lax.fori_loop(0, cnt, body, init)
                best_f = jnp.where(best_z < _FAR, best_f, -1)

                # Winner recovery: the 9 edge coefficients and the 3 corner
                # attribute rows ride ONE concatenated (chunk, 9 + 3*dpad)
                # operand, so each chunk pays a single one-hot matmul
                # instead of four (4x fewer MXU dispatches, identical
                # results — concatenation along the output columns).
                def body2(j, acc):
                    cid = ids_ref[0, t, j]
                    rd = rec_ref[0, cid]                 # (9 + 3*dpad, chunk)
                    onehot = (
                        best_f == cid * chunk + col
                    ).astype(jnp.float32)
                    return acc + jax.lax.dot_general(
                        onehot, rd,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=hp,
                    )

                rec = jax.lax.fori_loop(
                    0, cnt, body2,
                    jnp.zeros((n, 9 + 3 * dpad), jnp.float32),
                )
                coef9 = rec[:, :9]
                c0 = rec[:, 9:9 + dpad]
                c1 = rec[:, 9 + dpad:9 + 2 * dpad]
                c2 = rec[:, 9 + 2 * dpad:]
                b0 = x * coef9[:, 0:1] + y * coef9[:, 1:2] + coef9[:, 2:3]
                b1 = x * coef9[:, 3:4] + y * coef9[:, 4:5] + coef9[:, 5:6]
                b2 = x * coef9[:, 6:7] + y * coef9[:, 7:8] + coef9[:, 8:9]
                attr = b0 * c0 + b1 * c1 + b2 * c2

                z_ref[0, rg, :, sl] = best_z.reshape(tile, tile)
                fid_ref[0, rg, :, sl] = best_f.reshape(tile, tile)
                out_ref[0, rg, :, sl, :] = attr.reshape(tile, tile, dpad)
        return 0

    jax.lax.fori_loop(0, rows_per, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "chunk", "tile", "min_depth", "interpret"),
)
def zbuffer_sweep_rows_attrs_batched(
    face_data: jnp.ndarray,
    bbox: jnp.ndarray,
    corner_attrs: jnp.ndarray,
    h: int,
    w: int,
    chunk: int = 128,
    tile: int = 16,
    min_depth: float = 0.01,
    interpret: bool = False,
):
    """Row-granularity `zbuffer_sweep_tiled_attrs_batched` (same contract).

    One kernel invocation per (batch, tile-row); culling stays per 16-px
    tile; empty tiles skip both passes; outputs are row slabs so the image
    reassembly is a pure reshape. See the block comment above.

    Args / returns: identical to `zbuffer_sweep_tiled_attrs_batched`.
    """
    B, F = face_data.shape[:2]
    D = corner_attrs.shape[-1]
    assert F % chunk == 0 and h % tile == 0 and w % tile == 0
    nc = F // chunk
    h_tiles, w_tiles = h // tile, w // tile
    T = h_tiles * w_tiles
    dpad = max(8, -(-D // 8) * 8)

    tyx = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tyx % w_tiles * tile).astype(jnp.float32) + 0.5
    ty0 = (tyx // w_tiles * tile).astype(jnp.float32) + 0.5
    tx1 = tx0 + (tile - 1)
    ty1 = ty0 + (tile - 1)
    overlap = (
        (bbox[:, None, :, 0] <= tx1[None, :, None])
        & (bbox[:, None, :, 2] >= tx0[None, :, None])
        & (bbox[:, None, :, 1] <= ty1[None, :, None])
        & (bbox[:, None, :, 3] >= ty0[None, :, None])
    )                                                        # (B, T, F)
    chunk_hit = jnp.any(overlap.reshape(B, T, nc, chunk), axis=-1)
    counts = jnp.sum(chunk_hit, axis=-1).astype(jnp.int32)   # (B, T)
    ids = jnp.argsort(~chunk_hit, axis=-1, stable=True).astype(jnp.int32)

    face_vmem = face_data.reshape(B, nc, chunk, 16).transpose(0, 1, 3, 2)
    attr_pad = jnp.pad(corner_attrs, ((0, 0), (0, 0), (0, 0), (0, dpad - D)))
    # Winner-recovery operand: edge coefficients + the 3 corner-attr rows
    # concatenated along the output columns — one matmul per chunk in the
    # kernel's second pass.
    attr_rows = (
        attr_pad.reshape(B, nc, chunk, 3 * dpad).transpose(0, 1, 3, 2)
    )  # (B, nc, 3*dpad, chunk)
    rec_vmem = jnp.concatenate(
        [face_vmem[:, :, :9, :], attr_rows], axis=2
    )  # (B, nc, 9 + 3*dpad, chunk)

    # Rows per invocation: more rows amortize the per-invocation fixed cost
    # (grid sequencing + output-block DMA — measured ~18 us/invocation, the
    # LARGEST term of the per-tile kernel at the shipping shape), bounded by
    # the out-block VMEM footprint (double-buffered by the pipeline).
    # (The kernel body stays one row wide regardless — rows ride a dynamic
    # loop. r <= 3 is the empirical Mosaic scoped-VMEM ceiling at the
    # shipping shape: r=5 pushes the double-buffered out blocks + kernel
    # stack past the 16 MB scoped limit; the byte bound guards odd shapes.)
    rows_per = 1
    for r in range(min(h_tiles, 3), 0, -1):
        if h_tiles % r == 0 and r * tile * w * (dpad + 2) * 4 <= 1 << 20:
            rows_per = r
            break

    kernel = functools.partial(
        _rows_attrs_kernel_batched, tile=tile, w_tiles=w_tiles, chunk=chunk,
        dpad=dpad, rows_per=rows_per, min_depth=min_depth,
    )
    zt, ft, at = pl.pallas_call(
        kernel,
        grid=(B, h_tiles // rows_per),
        in_specs=[
            pl.BlockSpec(
                (1, T, nc), lambda b, g: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, T), lambda b, g: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, nc, 16, chunk), lambda b, g: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nc, 9 + 3 * dpad, chunk), lambda b, g: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, rows_per, tile, w), lambda b, g: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows_per, tile, w), lambda b, g: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows_per, tile, w, dpad), lambda b, g: (b, g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, h_tiles, tile, w), jnp.float32),
            jax.ShapeDtypeStruct((B, h_tiles, tile, w), jnp.int32),
            jax.ShapeDtypeStruct((B, h_tiles, tile, w, dpad), jnp.float32),
        ),
        interpret=interpret,
    )(ids, counts[:, None, :], face_vmem, rec_vmem)

    return (
        zt.reshape(B, h, w),
        ft.reshape(B, h, w),
        at.reshape(B, h, w, dpad)[..., :D],
    )
