"""Pallas z-buffer sweep vs the pure-JAX scan rasterizer (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnpose_tpu.render.raster import rasterize
from rnnpose_tpu.ops.pallas_raster import zbuffer_sweep
from rnnpose_tpu.data.synthetic import make_icosphere
from rnnpose_tpu.render import mesh as mesh_lib


def _setup():
    m = make_icosphere(2, 0.06)
    m = mesh_lib.pad_mesh(m, 256, 1024)
    verts = jnp.asarray(m.verts)[None] + jnp.asarray([[0.0, 0.0, 0.5]])
    faces = jnp.asarray(m.faces)
    K = jnp.asarray([[120.0, 120.0, 32.0, 32.0]])
    fv = jnp.asarray(np.arange(1024) < m.num_faces)
    return verts, faces, K, fv


def test_pallas_sweep_matches_scan(monkeypatch):
    verts, faces, K, fv = _setup()
    h = w = 64
    ref = rasterize(verts, faces, K, h, w, fv, chunk=128, use_pallas=False)

    # Force the pallas path through interpret mode by monkeypatching the
    # sweep to interpret=True.
    import rnnpose_tpu.render.raster as R
    import rnnpose_tpu.ops.pallas_raster as PR

    orig = PR.zbuffer_sweep

    def interp_sweep(face_data, h, w, chunk=128, rows=16, min_depth=0.01):
        return orig(face_data, h, w, chunk=chunk, rows=rows,
                    min_depth=min_depth, interpret=True)

    monkeypatch.setattr(PR, "zbuffer_sweep", interp_sweep)
    out = rasterize(verts, faces, K, h, w, fv, chunk=128, use_pallas=True)

    np.testing.assert_array_equal(ref.face_id, out.face_id)
    np.testing.assert_allclose(ref.zbuf, out.zbuf, atol=1e-5)
    np.testing.assert_allclose(ref.bary, out.bary, atol=1e-5)


def test_tiled_sweep_matches_scan(monkeypatch):
    verts, faces, K, fv = _setup()
    h = w = 64
    ref = rasterize(verts, faces, K, h, w, fv, chunk=128, use_pallas=False)

    import rnnpose_tpu.ops.pallas_raster as PR

    orig = PR.zbuffer_sweep_tiled

    def interp_sweep(face_data, bbox, h, w, chunk=128, tile=16,
                     min_depth=0.01):
        return orig(face_data, bbox, h, w, chunk=chunk, tile=tile,
                    min_depth=min_depth, interpret=True)

    monkeypatch.setattr(PR, "zbuffer_sweep_tiled", interp_sweep)
    out = rasterize(verts, faces, K, h, w, fv, chunk=128, use_pallas="tiled")

    np.testing.assert_array_equal(ref.face_id, out.face_id)
    np.testing.assert_allclose(ref.zbuf, out.zbuf, atol=1e-5)
    np.testing.assert_allclose(ref.bary, out.bary, atol=1e-5)


def test_tiled_sweep_sparse_coverage_and_batch(monkeypatch):
    """Culling path: object confined to a corner, most tiles empty; B=2."""
    import rnnpose_tpu.ops.pallas_raster as PR

    orig = PR.zbuffer_sweep_tiled

    def interp_sweep(face_data, bbox, h, w, chunk=128, tile=16,
                     min_depth=0.01):
        return orig(face_data, bbox, h, w, chunk=chunk, tile=tile,
                    min_depth=min_depth, interpret=True)

    monkeypatch.setattr(PR, "zbuffer_sweep_tiled", interp_sweep)

    m = make_icosphere(2, 0.06)
    m = mesh_lib.pad_mesh(m, 256, 1024)
    offs = jnp.asarray([[-0.15, -0.15, 0.9], [0.1, 0.12, 0.6]])
    verts = jnp.asarray(m.verts)[None] + offs[:, None, :]
    faces = jnp.asarray(m.faces)
    K = jnp.asarray([[120.0, 120.0, 48.0, 48.0], [120.0, 120.0, 48.0, 48.0]])
    fv = jnp.asarray(np.arange(1024) < m.num_faces)
    h = w = 96

    ref = rasterize(verts, faces, K, h, w, fv, chunk=128, use_pallas=False)
    out = rasterize(verts, faces, K, h, w, fv, chunk=128, use_pallas="tiled")

    # Both objects render partially off-center; every tile class is hit
    # (empty, partial, full).
    assert np.asarray(ref.face_id >= 0).mean() > 0.02
    np.testing.assert_array_equal(ref.face_id, out.face_id)
    np.testing.assert_allclose(ref.zbuf, out.zbuf, atol=1e-5)
    np.testing.assert_allclose(ref.bary, out.bary, atol=1e-5)


@pytest.mark.parametrize("grid", ["tile", "rows"])
def test_tiled_attrs_fused_matches_unfused(monkeypatch, grid):
    """Fused raster+attr kernel == scan raster + gather interpolation.

    Covers both batched grid granularities: the legacy per-(b, tile) kernel
    and the production per-(b, tile-row) kernel."""
    import rnnpose_tpu.ops.pallas_raster as PR
    import rnnpose_tpu.render.raster as R
    from rnnpose_tpu.render.raster import (
        interpolate_attributes,
        rasterize_with_vis_attrs,
    )

    name = (
        "zbuffer_sweep_tiled_attrs_batched"
        if grid == "tile" else "zbuffer_sweep_rows_attrs_batched"
    )
    orig = getattr(PR, name)

    def interp_sweep(face_data, bbox, corner_attrs, h, w, chunk=128,
                     tile=16, min_depth=0.01):
        return orig(face_data, bbox, corner_attrs, h, w, chunk=chunk,
                    tile=tile, min_depth=min_depth, interpret=True)

    monkeypatch.setattr(PR, name, interp_sweep)
    monkeypatch.setattr(R, "_GRID_PREF", grid)

    verts1, faces, K1, fv = _setup()
    # B=2 with different poses: exercises the batched (B, tiles) kernel grid.
    offs = jnp.asarray([[0.0, 0.0, 0.0], [0.08, -0.05, 0.15]])
    verts = jnp.concatenate([verts1, verts1 + offs[1]], axis=0)
    K = jnp.concatenate([K1, K1], axis=0)
    h = w = 64
    rs = np.random.RandomState(3)
    attrs = jnp.asarray(rs.randn(2, verts.shape[1], 6).astype(np.float32))

    ref_frags = rasterize(verts, faces, K, h, w, fv, chunk=128,
                          use_pallas=False)
    ref_attr = interpolate_attributes(ref_frags, faces, attrs)

    attr, zbuf, fid = rasterize_with_vis_attrs(
        verts, faces, K, attrs, h, w, fv, chunk=128, use_pallas=True
    )
    np.testing.assert_array_equal(ref_frags.face_id, fid)
    np.testing.assert_allclose(ref_frags.zbuf, zbuf, atol=1e-5)
    np.testing.assert_allclose(ref_attr, attr, atol=1e-4)
    assert np.asarray(fid >= 0).mean() > 0.05


def test_compute_bary_matches_full_raster():
    from rnnpose_tpu.render.raster import compute_bary

    verts, faces, K, fv = _setup()
    h = w = 64
    frags = rasterize(verts, faces, K, h, w, fv, chunk=128, use_pallas=False)
    fid_lr = frags.face_id[:, 4::8, 4::8]
    gx = jnp.arange(8, dtype=jnp.float32) * 8.0 + 4.0 + 0.5
    pix = jnp.stack(jnp.meshgrid(gx, gx, indexing="xy"), axis=-1)
    bary = compute_bary(verts, faces, K, fid_lr, pix, fv)
    np.testing.assert_allclose(frags.bary[:, 4::8, 4::8], bary, atol=1e-5)


def test_interpolate_attributes_onehot_matches_gather():
    from rnnpose_tpu.render.raster import (
        interpolate_attributes,
        interpolate_attributes_onehot,
    )

    verts, faces, K, fv = _setup()
    h = w = 32
    rs = np.random.RandomState(5)
    attrs = jnp.asarray(rs.randn(1, verts.shape[1], 13).astype(np.float32))
    frags = rasterize(verts, faces, K, h, w, fv, chunk=128, use_pallas=False)

    ref = interpolate_attributes(frags, faces, attrs)
    out = interpolate_attributes_onehot(frags, faces, attrs)
    np.testing.assert_allclose(ref, out, atol=1e-5)

    # Gradients w.r.t. the attributes match too (the one-hot form's VJP is a
    # matmul instead of a scatter-add).
    g_ref = jax.grad(
        lambda a: jnp.sum(interpolate_attributes(frags, faces, a) ** 2)
    )(attrs)
    g_out = jax.grad(
        lambda a: jnp.sum(interpolate_attributes_onehot(frags, faces, a) ** 2)
    )(attrs)
    np.testing.assert_allclose(g_ref, g_out, atol=1e-4)


@pytest.mark.parametrize("tile,hw", [(24, 48), (32, 64), (40, 80)])
def test_tiled_sweep_larger_tiles(tile, hw):
    """Larger kernel tiles (adaptive `_pick_tile`) match the scan sweep."""
    from rnnpose_tpu.ops.pallas_raster import zbuffer_sweep_tiled_attrs
    from rnnpose_tpu.render.raster import (
        _face_screen_data,
        interpolate_attributes,
    )

    verts, faces, K_, fv = _setup()
    K2 = jnp.asarray([[1.6 * hw, 1.6 * hw, hw / 2.0, hw / 2.0]])
    h = w = hw
    rs = np.random.RandomState(7)
    attrs = jnp.asarray(rs.randn(1, verts.shape[1], 5).astype(np.float32))

    ref_frags = rasterize(verts, faces, K2, h, w, fv, chunk=128,
                          use_pallas=False)
    ref_attr = interpolate_attributes(ref_frags, faces, attrs)

    from rnnpose_tpu.geometry import projective as proj

    uv, _ = proj.project(verts, K2[:, None, :])
    z = verts[..., 2]
    edge_coef, zf, valid, area2 = _face_screen_data(uv[0], z[0], faces, fv)
    inv_area = jnp.where(valid, 1.0 / jnp.where(valid, area2, 1.0), 0.0)
    coef = edge_coef * inv_area[:, None, None]
    zcoef = jnp.einsum("fkc,fk->fc", coef, zf)
    F = faces.shape[0]
    fd = jnp.concatenate(
        [coef.reshape(F, 9), zcoef, valid.astype(jnp.float32)[:, None],
         jnp.zeros((F, 3))], -1)
    fuv = uv[0][faces]
    big = jnp.float32(1e9)
    bbox = jnp.concatenate(
        [jnp.where(valid[:, None], jnp.min(fuv, 1), big),
         jnp.where(valid[:, None], jnp.max(fuv, 1), -big)], -1)
    corner = attrs[0][faces]
    zb, fid, attr = zbuffer_sweep_tiled_attrs(
        fd, bbox, corner, h, w, chunk=128, tile=tile, interpret=True)

    assert np.asarray(ref_frags.face_id[0] >= 0).mean() > 0.02
    np.testing.assert_array_equal(ref_frags.face_id[0], fid)
    hit = np.asarray(fid) >= 0
    np.testing.assert_allclose(
        np.asarray(ref_frags.zbuf[0])[hit], np.asarray(zb)[hit], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref_attr[0])[hit], np.asarray(attr)[hit], atol=1e-4)
