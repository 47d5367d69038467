"""Differentiable mesh rasterization, TPU-first.

Replaces the reference's dependency on the PyTorch3D CUDA rasterizer
(`geometry/diff_render_optim.py:185-199,269-325`: rasterize once, then
interpolate vertex attributes with the barycentric coordinates).

Design (see SURVEY.md §7.4): rasterization itself is **not** on the gradient
path — the reference detaches depth and poses into the renderer
(`model/PoseRefiner.py:141,248-251`); gradients flow only through
`interpolate_attributes` w.r.t. the per-vertex attribute values. So the
z-buffer resolve can be computed without autodiff bookkeeping, and the
attribute interpolation is a plain gather + weighted sum.

Production TPU path: the tile-culled Pallas kernel
(`ops/pallas_raster.zbuffer_sweep_tiled_attrs_batched`) sweeps each 16x16
pixel tile over only the face chunks whose screen bboxes overlap it
(Morton-ordered faces keep chunk bboxes tight) and recovers the winner's
barycentrics + vertex attributes with exact one-hot MXU matmuls — no
per-pixel gathers exist anywhere on the raster path. The pure-XLA fallback
expresses the sweep as a `lax.scan` of `[P, 3] @ [3, C]` edge-function
matmuls with a VPU inside-test + z-resolve; backend selection happens at
lowering time via `lax.platform_dependent`. Meshes are decimated / padded
to a static face budget at load time (`render/mesh.py`), so shapes are
fully static. Screen-space (non-perspective-correct) barycentrics match
PyTorch3D's rasterizer defaults used by the reference.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import projective as proj

__all__ = [
    "Fragments",
    "rasterize",
    "rasterize_with_vis_attrs",
    "interpolate_attributes",
    "interpolate_attributes_onehot",
    "render_mesh_attributes",
]

_FAR = 1e9
_AREA_EPS = 1e-9
_TILE_PREF = os.environ.get("RNNPOSE_RASTER_TILE")
# Batched fused-sweep grid granularity: "rows" (default, one invocation per
# 16-px tile row) or "tile" (legacy per-tile grid). Read once at import —
# trace-time reads are invisible to the jit cache.
_GRID_PREF = os.environ.get("RNNPOSE_RASTER_GRID", "rows")


class Fragments(NamedTuple):
    """Per-pixel rasterization results (PyTorch3D naming for familiarity)."""

    face_id: jnp.ndarray  # (B, H, W) int32, -1 where background
    bary: jnp.ndarray     # (B, H, W, 3) screen-space barycentric coords
    zbuf: jnp.ndarray     # (B, H, W) interpolated depth, 0 where background


def _face_screen_data(uv, z, faces, face_valid):
    """Per-face screen-space vertex data + edge coefficients.

    Returns:
      edge_coef: (F, 3, 3) rows [a, b, c] with E_k(x, y) = a x + b y + c
        being twice the signed area of (p, v_{k+1}, v_{k+2}).
      zf: (F, 3) per-corner depths.
      valid: (F,) non-degenerate, fully-front faces.
      area2: (F,) twice signed area.
    """
    fuv = uv[faces]                   # (F, 3, 2)
    zf = z[faces]                     # (F, 3)
    x0, y0 = fuv[:, 0, 0], fuv[:, 0, 1]
    x1, y1 = fuv[:, 1, 0], fuv[:, 1, 1]
    x2, y2 = fuv[:, 2, 0], fuv[:, 2, 1]
    # E0 (weight of v0) from edge v1->v2, etc.
    a = jnp.stack([y1 - y2, y2 - y0, y0 - y1], axis=-1)          # (F, 3)
    b = jnp.stack([x2 - x1, x0 - x2, x1 - x0], axis=-1)
    c = jnp.stack(
        [x1 * y2 - x2 * y1, x2 * y0 - x0 * y2, x0 * y1 - x1 * y0], axis=-1
    )
    edge_coef = jnp.stack([a, b, c], axis=-1)                    # (F, 3, 3)
    area2 = a[:, 0] * x0 + b[:, 0] * y0 + c[:, 0]  # E0 at v0 == 2*area
    front = jnp.all(zf > proj.MIN_DEPTH, axis=-1)
    valid = face_valid & front & (jnp.abs(area2) > _AREA_EPS)
    return edge_coef, zf, valid, area2


def _pick_tile(h: int, w: int, chunk: int) -> Optional[int]:
    """Kernel pixel tile for the raster sweep.

    16 wins at the production operating point: the zoom crop makes the
    object fill most of the raster, so finer tiles cull face chunks much
    better than they pay in per-invocation overhead (full-model bench:
    77.1 fps @16 vs 70.8 @24 vs 66.9 @40). Larger tiles only win for
    sparse coverage (object small in frame). RNNPOSE_RASTER_TILE (read once
    at import — trace-time reads are invisible to the jit cache) overrides
    for experiments; VMEM bounds the (tile^2, chunk) working set."""
    for t in ((int(_TILE_PREF),) if _TILE_PREF else (16,)):
        if h % t == 0 and w % t == 0 and t * t * chunk * 4 * 6 <= 8 << 20:
            return t
    return None


def _use_pallas_default():
    # Measured on v5e @ 240^2/4096 faces: the tile-culled Pallas sweep
    # (`ops/pallas_raster.zbuffer_sweep_tiled`) only evaluates face chunks
    # whose screen bbox overlaps each 16x16 pixel tile — typically <15% of
    # the brute-force pixel/face pairs — and keeps the running z-min in
    # VMEM. The lax.scan sweep (4.5 ms) materializes (P, C) candidates in
    # HBM between steps; the untiled Pallas kernel (10.4 ms) is VPU-bound on
    # the full P*F sweep. 'tiled' wins on TPU; the scan remains the
    # CPU/fallback path.
    try:
        import jax.extend as jex

        if jex.backend.get_backend().platform == "tpu":
            return "tiled"
    except Exception:
        pass
    return False


def _rasterize_single(uv, z, faces, face_valid, h, w, chunk, use_pallas,
                      compact_to=None):
    """Rasterize one mesh instance. uv (V, 2), z (V,), faces (F, 3).

    compact_to: optionally sort faces by validity and sweep only the first
    `compact_to` (static) — used with per-pose backface culling, where ~half
    the faces are invalid every frame but static shapes forbid dropping them
    dynamically."""
    F = faces.shape[0]
    assert F % chunk == 0, f"face count {F} must be divisible by chunk {chunk}"
    edge_coef, zf, valid, area2 = _face_screen_data(uv, z, faces, face_valid)

    # Normalize edge functions by the signed area so that E/area are the
    # barycentric weights and orientation is handled uniformly.
    inv_area = jnp.where(valid, 1.0 / jnp.where(valid, area2, 1.0), 0.0)
    coef = edge_coef * inv_area[:, None, None]                   # (F, 3, 3)
    # z baked into a 4th linear functional: depth(x, y) = sum_k bary_k z_k is
    # itself affine in (x, y): d = (sum_k coef_k z_k) . [x, y, 1].
    zcoef = jnp.einsum("fkc,fk->fc", coef, zf)                   # (F, 3)

    grid = proj.coords_grid(h, w)                                # (H, W, 2)
    pix = jnp.concatenate(
        [grid.reshape(-1, 2) + 0.5, jnp.ones((h * w, 1))], axis=-1
    )  # (P, 3) pixel centers, homogeneous

    perm = None
    if compact_to is not None and compact_to < F:
        assert compact_to % chunk == 0
        # Valid faces first (stable order); sweep only the head.
        perm = jnp.argsort(~valid)[:compact_to]
        coef = coef[perm]
        zcoef = zcoef[perm]
        valid = valid[perm]
        F = compact_to

    if use_pallas:
        face_data = jnp.concatenate(
            [
                coef.reshape(F, 9),
                zcoef,
                valid.astype(jnp.float32)[:, None],
                jnp.zeros((F, 3), coef.dtype),
            ],
            axis=-1,
        )
        if use_pallas == "tiled":
            from ..ops.pallas_raster import zbuffer_sweep_tiled

            fuv = uv[faces]                                  # (F, 3, 2)
            if perm is not None:
                fuv = fuv[perm]
            big = jnp.float32(_FAR)
            bbox = jnp.concatenate(
                [
                    jnp.where(valid[:, None], jnp.min(fuv, axis=1), big),
                    jnp.where(valid[:, None], jnp.max(fuv, axis=1), -big),
                ],
                axis=-1,
            )  # (F, 4) [x0, y0, x1, y1]; empty when invalid
            zb, fid2d = zbuffer_sweep_tiled(
                face_data, bbox, h, w, chunk=chunk,
                tile=_pick_tile(h, w, chunk) or 16,
            )
        else:
            from ..ops.pallas_raster import zbuffer_sweep

            zb, fid2d = zbuffer_sweep(face_data, h, w, chunk=chunk)
        best_z = zb.reshape(-1)
        best_fid = fid2d.reshape(-1)
        hit = best_fid >= 0
        fid_safe = jnp.where(hit, best_fid, 0)
        bary = jnp.einsum("pc,pkc->pk", pix, coef[fid_safe],
                          precision=jax.lax.Precision.HIGHEST)
        bary = jnp.where(hit[:, None], bary, 0.0)
        zout = jnp.where(hit, best_z, 0.0)
        best_fid = jnp.where(hit, best_fid, -1)
        if perm is not None:
            best_fid = jnp.where(hit, perm[fid_safe], -1)
        return (
            best_fid.reshape(h, w),
            bary.reshape(h, w, 3),
            zout.reshape(h, w),
        )

    coef_chunks = coef.reshape(F // chunk, chunk, 3, 3)
    zcoef_chunks = zcoef.reshape(F // chunk, chunk, 3)
    valid_chunks = valid.reshape(F // chunk, chunk)

    def body(carry, inp):
        best_z, best_fid = carry
        coef_c, zcoef_c, valid_c, base = inp
        # Four MXU matmuls (P, 3) @ (3, C): the three edge functions and the
        # affine depth. Kept as separate matmuls (no pack/reshape) so XLA can
        # fuse the inside-test + z-select + min-reduce into the matmul
        # epilogue instead of materializing (P, 4C) intermediates.
        # HIGHEST precision: TPU f32 matmuls default to bf16 passes, which
        # corrupts the edge inside-tests (measured: 7.7% of pixels got the
        # wrong face / z off by up to 0.8 at 240^2) — exact f32 is required.
        hp = jax.lax.Precision.HIGHEST
        e0 = jnp.matmul(pix, coef_c[:, 0, :].T, precision=hp)    # (P, C)
        e1 = jnp.matmul(pix, coef_c[:, 1, :].T, precision=hp)
        e2 = jnp.matmul(pix, coef_c[:, 2, :].T, precision=hp)
        depth = jnp.matmul(pix, zcoef_c.T, precision=hp)         # (P, C)
        inside = (
            (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & valid_c[None, :]
        )
        zcand = jnp.where(inside & (depth > proj.MIN_DEPTH), depth, _FAR)
        # Nearest face within the chunk via two pure reductions (min+argmin);
        # no take_along_axis — generic gathers are pathological on TPU.
        local_z = jnp.min(zcand, axis=-1)                        # (P,)
        local_arg = jnp.argmin(zcand, axis=-1).astype(jnp.int32)  # (P,)
        take = local_z < best_z
        best_z = jnp.where(take, local_z, best_z)
        best_fid = jnp.where(take, base + local_arg, best_fid)
        return (best_z, best_fid), None

    init = (
        jnp.full((h * w,), _FAR, dtype=uv.dtype),
        jnp.full((h * w,), -1, dtype=jnp.int32),
    )
    bases = (jnp.arange(F // chunk, dtype=jnp.int32) * chunk)
    (best_z, best_fid), _ = jax.lax.scan(
        body, init, (coef_chunks, zcoef_chunks, valid_chunks, bases)
    )

    hit = best_fid >= 0
    fid_safe = jnp.where(hit, best_fid, 0)
    # Recompute barycentrics for the winning face only (cheaper than carrying
    # them through the scan: (P, 3) vs (P, C, 3) carry traffic).
    bary = jnp.einsum("pc,pkc->pk", pix, coef[fid_safe],
                      precision=jax.lax.Precision.HIGHEST)   # (P, 3)
    bary = jnp.where(hit[:, None], bary, 0.0)
    zout = jnp.where(hit, best_z, 0.0)
    best_fid = jnp.where(hit, best_fid, -1)
    if perm is not None:
        best_fid = jnp.where(hit, perm[fid_safe], -1)
    return (
        best_fid.reshape(h, w),
        bary.reshape(h, w, 3),
        zout.reshape(h, w),
    )


def rasterize(
    verts_cam: jnp.ndarray,
    faces: jnp.ndarray,
    intrinsics: jnp.ndarray,
    h: int,
    w: int,
    face_valid: Optional[jnp.ndarray] = None,
    chunk: int = 128,
    use_pallas: Optional[bool] = None,
    face_keep: Optional[jnp.ndarray] = None,
    compact_to: Optional[int] = None,
) -> Fragments:
    """Rasterize camera-frame meshes.

    Args:
      verts_cam: (B, V, 3) vertices in camera frame (pose already applied).
      faces: (F, 3) int32 triangle indices (shared across batch).
      intrinsics: (B, 4) [fx, fy, cx, cy].
      h, w: raster size.
      face_valid: optional (F,) mask for padded faces.
      chunk: faces per scan step (F must be a multiple).
      use_pallas: run the z-buffer sweep as the Pallas TPU kernel
        (`ops/pallas_raster.py`); default: auto (TPU backend only).
      face_keep: optional (B, F) per-pose keep mask (e.g. backface culling).
      compact_to: with face_keep, sort faces by validity and sweep only this
        many (static; must cover the max possible kept count).
    Returns:
      Fragments with (B, H, W[, 3]) leaves. Not on the gradient path.
    """
    if face_valid is None:
        # Treat degenerate all-same-index padding faces as invalid.
        face_valid = ~(
            (faces[:, 0] == faces[:, 1]) & (faces[:, 1] == faces[:, 2])
        )
    uv, _ = proj.project(verts_cam, intrinsics[:, None, :])
    z = verts_cam[..., 2]

    if face_keep is None:
        face_keep = jnp.ones((uv.shape[0], faces.shape[0]), bool)

    def _run(mode):
        def one(uv_b, z_b, keep_b):
            return _rasterize_single(
                uv_b, z_b, faces, face_valid & keep_b, h, w, chunk, mode,
                compact_to,
            )

        def call(uv, z, face_keep):
            if mode == "tiled":
                # Scalar-prefetch grids don't vmap; batch is a static Python
                # loop (B is small — per-class batches).
                outs = [
                    one(uv[b], z[b], face_keep[b]) for b in range(uv.shape[0])
                ]
                return tuple(jnp.stack(x) for x in zip(*outs))
            return jax.vmap(one)(uv, z, face_keep)

        return call

    if use_pallas is None and _pick_tile(h, w, chunk) is not None:
        # Resolved per backend at lowering time: the Pallas kernel on TPU,
        # the scan sweep everywhere else (incl. CPU devices inside a TPU
        # process — `jax.default_device` does not change the default
        # backend, so a process-global choice would crash there).
        fid, bary, zbuf = jax.lax.platform_dependent(
            uv, z, face_keep, tpu=_run("tiled"), default=_run(False)
        )
    else:
        mode = _use_pallas_default() if use_pallas is None else use_pallas
        if mode == "tiled" and _pick_tile(h, w, chunk) is None:
            mode = False
        fid, bary, zbuf = _run(mode)(uv, z, face_keep)
    fid = jax.lax.stop_gradient(fid)
    bary = jax.lax.stop_gradient(bary)
    zbuf = jax.lax.stop_gradient(zbuf)
    return Fragments(face_id=fid, bary=bary, zbuf=zbuf)


def rasterize_with_vis_attrs(
    verts_cam: jnp.ndarray,
    faces: jnp.ndarray,
    intrinsics: jnp.ndarray,
    vis_attrs: jnp.ndarray,
    h: int,
    w: int,
    face_valid: Optional[jnp.ndarray] = None,
    chunk: int = 128,
    use_pallas: Optional[bool] = None,
):
    """Rasterize and interpolate NON-differentiable vertex attributes fused.

    On TPU the z-buffer resolve and the attribute interpolation run in one
    Pallas kernel (`ops/pallas_raster.zbuffer_sweep_tiled_attrs`) — the
    winner's edge coefficients and corner attributes are recovered with
    exact one-hot matmuls, so the per-pixel `coef[fid]` / `attrs[faces][fid]`
    gathers (the hottest op group at 240^2, ~4 ms/frame) never happen, and
    full-resolution barycentrics are never materialized. Elsewhere it
    lowers to `rasterize` + `interpolate_attributes`.

    The whole result is stop-gradient — use for constant attributes only
    (mesh RGB colors, camera-frame normals: the reference's texture render,
    `diff_render_optim.py:201-244`). For attributes on the gradient path use
    `interpolate_attributes[_onehot]` with the returned face ids (see
    `compute_bary` for subgrid barycentrics).

    Returns:
      (attrs (B, h, w, D), zbuf (B, h, w) 0 where empty,
       face_id (B, h, w) -1 where empty).
    """
    if face_valid is None:
        face_valid = ~(
            (faces[:, 0] == faces[:, 1]) & (faces[:, 1] == faces[:, 2])
        )
    uv, _ = proj.project(verts_cam, intrinsics[:, None, :])
    z = verts_cam[..., 2]

    def _prep_single(uv_b, z_b):
        F = faces.shape[0]
        edge_coef, zf, valid, area2 = _face_screen_data(
            uv_b, z_b, faces, face_valid
        )
        inv_area = jnp.where(valid, 1.0 / jnp.where(valid, area2, 1.0), 0.0)
        coef = edge_coef * inv_area[:, None, None]
        zcoef = jnp.einsum("fkc,fk->fc", coef, zf)
        face_data = jnp.concatenate(
            [
                coef.reshape(F, 9),
                zcoef,
                valid.astype(jnp.float32)[:, None],
                jnp.zeros((F, 3), coef.dtype),
            ],
            axis=-1,
        )
        fuv = uv_b[faces]
        big = jnp.float32(_FAR)
        bbox = jnp.concatenate(
            [
                jnp.where(valid[:, None], jnp.min(fuv, axis=1), big),
                jnp.where(valid[:, None], jnp.max(fuv, axis=1), -big),
            ],
            axis=-1,
        )
        return face_data, bbox

    def _run_fused(uv, z, vis_attrs):
        from ..ops.pallas_raster import (
            zbuffer_sweep_rows_attrs_batched,
            zbuffer_sweep_tiled_attrs_batched,
        )

        face_data, bbox = jax.vmap(_prep_single)(uv, z)
        corner_attrs = jax.vmap(lambda a: a[faces])(vis_attrs)  # (B, F, 3, D)
        # One kernel over a (B, 3-tile-row) grid — the per-(b, tile) grid's
        # fixed invocation cost dominated (most tiles sweep 0-2 chunks after
        # culling); the row kernel is 1.8x faster at the shipping shape and
        # bit-identical (BENCHLOG round 3 item 7: 7.08 -> 3.94 ms/call,
        # full-model B=8 115.5 -> 144.2 fps with the fused winner recovery).
        # RNNPOSE_RASTER_GRID=tile restores the per-tile kernel for A/B.
        sweep = (
            zbuffer_sweep_tiled_attrs_batched
            if _GRID_PREF == "tile" else zbuffer_sweep_rows_attrs_batched
        )
        zb, fid, attr = sweep(
            face_data, bbox, corner_attrs, h, w, chunk=chunk,
            tile=_pick_tile(h, w, chunk) or 16,
        )
        hit = fid >= 0
        return (
            jnp.where(hit[..., None], attr, 0.0),
            jnp.where(hit, zb, 0.0),
            fid,
        )

    def _run_unfused(uv, z, vis_attrs):
        keep = jnp.ones((uv.shape[0], faces.shape[0]), bool)
        fid, bary, zbuf = jax.vmap(
            lambda uv_b, z_b, k_b: _rasterize_single(
                uv_b, z_b, faces, face_valid & k_b, h, w, chunk, False
            )
        )(uv, z, keep)
        frags = Fragments(face_id=fid, bary=bary, zbuf=zbuf)
        attr = interpolate_attributes(frags, faces, vis_attrs)
        return attr, zbuf, fid

    tiled_ok = _pick_tile(h, w, chunk) is not None
    if use_pallas is None and tiled_ok:
        attr, zbuf, fid = jax.lax.platform_dependent(
            uv, z, vis_attrs, tpu=_run_fused, default=_run_unfused
        )
    elif use_pallas and tiled_ok:
        attr, zbuf, fid = _run_fused(uv, z, vis_attrs)
    else:
        attr, zbuf, fid = _run_unfused(uv, z, vis_attrs)
    return (
        jax.lax.stop_gradient(attr),
        jax.lax.stop_gradient(zbuf),
        jax.lax.stop_gradient(fid),
    )


def compute_bary(
    verts_cam: jnp.ndarray,
    faces: jnp.ndarray,
    intrinsics: jnp.ndarray,
    fid: jnp.ndarray,
    pix_xy: jnp.ndarray,
    face_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Barycentric coordinates of given (face id, pixel center) pairs.

    Used to recover barycentrics at a SUBGRID of a fused rasterization
    (`rasterize_with_vis_attrs` does not materialize full-res barycentrics).
    The gather is (P', 3, 3) — negligible for a 1/8 grid.

    Args:
      fid: (B, h', w') winning face ids (-1 background).
      pix_xy: (h', w', 2) absolute pixel-center coordinates in the raster
        frame the faces were rasterized in.
    Returns:
      (B, h', w', 3), zeros at background.
    """
    if face_valid is None:
        face_valid = ~(
            (faces[:, 0] == faces[:, 1]) & (faces[:, 1] == faces[:, 2])
        )
    uv, _ = proj.project(verts_cam, intrinsics[:, None, :])
    z = verts_cam[..., 2]
    hp, wp = fid.shape[1], fid.shape[2]
    pix = jnp.concatenate(
        [pix_xy.reshape(-1, 2), jnp.ones((hp * wp, 1), uv.dtype)], axis=-1
    )

    def one(uv_b, z_b, fid_b):
        edge_coef, zf, valid, area2 = _face_screen_data(
            uv_b, z_b, faces, face_valid
        )
        inv_area = jnp.where(valid, 1.0 / jnp.where(valid, area2, 1.0), 0.0)
        coef = edge_coef * inv_area[:, None, None]
        hit = fid_b.reshape(-1) >= 0
        safe = jnp.where(hit, fid_b.reshape(-1), 0)
        bary = jnp.einsum(
            "pc,pkc->pk", pix, coef[safe],
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.where(hit[:, None], bary, 0.0).reshape(hp, wp, 3)

    return jax.lax.stop_gradient(jax.vmap(one)(uv, z, fid))


def interpolate_attributes(
    fragments: Fragments,
    faces: jnp.ndarray,
    vert_attrs: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric vertex-attribute interpolation — the differentiable half.

    Equivalent of PyTorch3D's `interpolate_face_attributes` as used by the
    reference's `forward_interpolate` (`geometry/diff_render_optim.py:185-199`).
    Gradients flow to `vert_attrs` through the gather + weighted sum.

    Args:
      fragments: from `rasterize`.
      faces: (F, 3) int32.
      vert_attrs: (B, V, D) per-vertex attributes.
    Returns:
      (B, H, W, D), zeros at background pixels.
    """
    fid = fragments.face_id
    hit = fid >= 0
    fid_safe = jnp.where(hit, fid, 0)

    def one(attrs_b, fid_b, bary_b, hit_b):
        face_attr = attrs_b[faces]                      # (F, 3, D)
        px = face_attr[fid_b.reshape(-1)]               # (P, 3, D)
        out = jnp.einsum("pk,pkd->pd", bary_b.reshape(-1, 3), px)
        out = out * hit_b.reshape(-1, 1)
        return out.reshape(fid_b.shape + (attrs_b.shape[-1],))

    return jax.vmap(one)(
        vert_attrs, fid_safe, fragments.bary, hit.astype(vert_attrs.dtype)
    )


def interpolate_attributes_onehot(
    fragments: Fragments,
    faces: jnp.ndarray,
    vert_attrs: jnp.ndarray,
) -> jnp.ndarray:
    """Attribute interpolation as a bary-weighted one-hot matmul.

    Same semantics (and gradients) as `interpolate_attributes`, but shaped
    for the MXU: builds M (P, V) with M[p, v] = sum_k bary_k [corner_k = v]
    and contracts M @ attrs. Forward AND backward (dattrs = M^T @ g) are
    single matmuls — no (F, 3, D) intermediate, no scatter in the VJP (the
    gather form's backward is a scatter-add, pathological on TPU).

    Use when P*V is small enough to hold M (e.g. the 1/8 feature grid:
    900 x 2048 = 7 MB); prefer the gather form for full-res rasters.
    """
    B, hp, wp = fragments.face_id.shape
    V = vert_attrs.shape[1]
    fid = fragments.face_id.reshape(B, -1)
    hit = fid >= 0
    safe = jnp.where(hit, fid, 0)
    corner = faces[safe]                                  # (B, P, 3) int32
    bary = fragments.bary.reshape(B, -1, 3) * hit[..., None]
    iota = jnp.arange(V, dtype=corner.dtype)
    # (B, P, 3, V) compare fuses into the reduce; M never hits HBM at (.., 3, V).
    M = jnp.sum(
        jnp.where(corner[..., None] == iota, bary[..., None], 0.0), axis=2
    )                                                     # (B, P, V)
    out = jnp.einsum(
        "bpv,bvd->bpd", M, vert_attrs,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(B, hp, wp, vert_attrs.shape[-1])


def render_mesh_attributes(
    verts_cam: jnp.ndarray,
    faces: jnp.ndarray,
    intrinsics: jnp.ndarray,
    vert_attrs: jnp.ndarray,
    h: int,
    w: int,
    face_valid: Optional[jnp.ndarray] = None,
    chunk: int = 128,
):
    """Rasterize + interpolate in one call.

    Returns (attr_maps (B, H, W, D), depth (B, H, W), mask (B, H, W)).
    """
    frags = rasterize(verts_cam, faces, intrinsics, h, w, face_valid, chunk)
    attr = interpolate_attributes(frags, faces, vert_attrs)
    mask = (frags.face_id >= 0).astype(verts_cam.dtype)
    return attr, frags.zbuf, mask
