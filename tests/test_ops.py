import jax
import jax.numpy as jnp
import numpy as np

from rnnpose_tpu.ops import corr, fps, knn, kpconv_ops, sampler, upsample


# ---------------------------------------------------------------- sampler
def test_bilinear_sample_exact_at_integer_coords(rng):
    img = jnp.asarray(rng.randn(2, 8, 10, 3).astype(np.float32))
    g = jnp.stack(jnp.meshgrid(jnp.arange(10.0), jnp.arange(8.0), indexing="xy"), -1)
    out = sampler.bilinear_sample(img, jnp.broadcast_to(g, (2, 8, 10, 2)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_bilinear_sample_midpoint(rng):
    img = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0, 0].set(1.0)
    out = sampler.bilinear_sample(img, jnp.asarray([[[0.5, 0.5]]]))
    np.testing.assert_allclose(out, [[[0.25]]], atol=1e-6)


def test_bilinear_sample_outside_zero(rng):
    img = jnp.ones((1, 4, 4, 1))
    out = sampler.bilinear_sample(img, jnp.asarray([[[-5.0, 2.0], [2.0, 10.0]]]))
    np.testing.assert_allclose(out, np.zeros((1, 2, 1)), atol=1e-6)


def test_bilinear_sample_grad(rng):
    img = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))

    def f(c):
        return jnp.sum(sampler.bilinear_sample(img, c))

    g = jax.grad(f)(jnp.asarray([[[2.3, 3.7]]]))
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- corr
def _np_corr(f1, f2):
    B, H, W, C = f1.shape
    a = f1.reshape(B, H * W, C)
    b = f2.reshape(B, H * W, C)
    return np.einsum("bnc,bmc->bnm", a, b) / np.sqrt(C)


def test_corr_pyramid_level0_matches_numpy(rng):
    f1 = rng.randn(2, 8, 8, 16).astype(np.float32)
    f2 = rng.randn(2, 8, 8, 16).astype(np.float32)
    pyr = corr.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=3)
    ref = _np_corr(f1, f2).reshape(2, 64, 8, 8)
    np.testing.assert_allclose(pyr.levels[0], ref, atol=1e-4)
    assert pyr.levels[1].shape == (2, 64, 4, 4)
    assert pyr.levels[2].shape == (2, 64, 2, 2)


def test_corr_lookup_center_identity(rng):
    """Lookup with r=0 at integer self-coords returns the diagonal corr."""
    f = rng.randn(1, 4, 4, 8).astype(np.float32)
    pyr = corr.build_corr_pyramid(jnp.asarray(f), jnp.asarray(f), num_levels=1)
    from rnnpose_tpu.geometry.projective import coords_grid

    coords = coords_grid(4, 4)[None]
    out = corr.corr_lookup(pyr, coords, radius=0)
    assert out.shape == (1, 4, 4, 1)
    ref = _np_corr(f, f).reshape(16, 16).diagonal().reshape(4, 4)
    np.testing.assert_allclose(out[0, :, :, 0], ref, atol=1e-4)


def test_corr_lookup_shape(rng):
    f1 = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    pyr = corr.build_corr_pyramid(f1, f1, num_levels=4)
    coords = jnp.zeros((2, 8, 8, 2))
    out = corr.corr_lookup(pyr, coords, radius=3)
    assert out.shape == (2, 8, 8, 4 * 49)


def test_corr_lookup_impls_agree(rng):
    """'mulreduce' (default) and 'bandmm' are the same math, different
    lowerings; assert allclose at fractional coords on two shapes."""
    for B, H, W, C, r in ((1, 6, 6, 8, 2), (2, 8, 10, 16, 4)):
        f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        pyr = corr.build_corr_pyramid(f1, f2, num_levels=3)
        coords = jnp.asarray(
            rng.rand(B, H, W, 2).astype(np.float32) * [W - 1, H - 1]
        )
        a = corr.corr_lookup(pyr, coords, radius=r, impl="mulreduce")
        b = corr.corr_lookup(pyr, coords, radius=r, impl="bandmm")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_corr_lookup_rejects_unknown_impl(rng):
    f1 = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    pyr = corr.build_corr_pyramid(f1, f1, num_levels=1)
    import pytest

    with pytest.raises(ValueError, match="impl"):
        corr.corr_lookup(pyr, jnp.zeros((1, 4, 4, 2)), impl="typo")


# ---------------------------------------------------------------- upsample
def test_unfold3x3():
    x = jnp.arange(9.0).reshape(1, 3, 3, 1)
    p = upsample.unfold3x3(x)
    assert p.shape == (1, 3, 3, 9, 1)
    # center pixel's patch = full image row-major
    np.testing.assert_allclose(p[0, 1, 1, :, 0], np.arange(9.0))


def test_convex_upsample_uniform_mask_is_smooth(rng):
    flow = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    mask = jnp.zeros((1, 4, 4, 9 * 64))
    up = upsample.convex_upsample(flow, mask, factor=8)
    assert up.shape == (1, 32, 32, 2)
    # uniform softmax -> local average of 3x3 * 8; center block ~ mean
    assert np.isfinite(np.asarray(up)).all()


def test_convex_upsample_center_mask_replicates():
    flow = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2))
    mask = np.full((1, 2, 2, 9, 8, 8), -1e9, np.float32)
    mask[:, :, :, 4] = 0.0  # only the center tap
    up = upsample.convex_upsample(flow, jnp.asarray(mask.reshape(1, 2, 2, -1)), factor=8)
    np.testing.assert_allclose(up[0, :8, :8, 0], np.full((8, 8), 0.0) * 8, atol=1e-4)
    np.testing.assert_allclose(up[0, 8:, 8:, 1], np.full((8, 8), 7.0) * 8, atol=1e-3)


def test_upflow_shape(rng):
    flow = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    up = upsample.upflow(flow, 8)
    assert up.shape == (1, 32, 32, 2)


# ---------------------------------------------------------------- knn
def test_nearest_neighbor_matches_numpy(rng):
    q = rng.randn(50, 3).astype(np.float32)
    r = rng.randn(80, 3).astype(np.float32)
    idx = np.asarray(knn.nearest_neighbor_idx(jnp.asarray(q), jnp.asarray(r)))
    ref = np.argmin(((q[:, None] - r[None]) ** 2).sum(-1), axis=-1)
    np.testing.assert_array_equal(idx, ref)


def test_knn_sorted(rng):
    q = rng.randn(10, 3).astype(np.float32)
    r = rng.randn(30, 3).astype(np.float32)
    d, idx = knn.knn(jnp.asarray(q), jnp.asarray(r), 5)
    d = np.asarray(d)
    assert (np.diff(d, axis=-1) >= -1e-6).all()


# ---------------------------------------------------------------- fps
def test_fps_spreads_points(rng):
    pts = np.concatenate(
        [rng.randn(50, 3) * 0.01, rng.randn(50, 3) * 0.01 + 10.0]
    ).astype(np.float32)
    idx = np.asarray(fps.furthest_point_sample(jnp.asarray(pts), 2))
    # Second sample must come from the far cluster.
    assert (idx[0] < 50) != (idx[1] < 50)


def test_fps_unique(rng):
    pts = jnp.asarray(rng.randn(64, 3).astype(np.float32))
    idx = np.asarray(fps.furthest_point_sample(pts, 16))
    assert len(set(idx.tolist())) == 16


# ---------------------------------------------------------------- kpconv
def test_gather_neighbors_shadow_zero(rng):
    feats = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    inds = jnp.asarray([[0, 1, 5], [2, 5, 5]])  # 5 = shadow
    out = kpconv_ops.gather_neighbors(feats, inds)
    np.testing.assert_allclose(out[0, 2], np.zeros(4))
    np.testing.assert_allclose(out[1, 0], feats[2], atol=1e-6)


def test_kpconv_identity_kernel(rng):
    """Single kernel point at origin, identity weights, one self-neighbor ->
    output == input features (influence 1 at distance 0)."""
    n = 6
    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    inds = jnp.arange(n)[:, None]  # each point's only neighbor is itself
    kp = jnp.zeros((1, 3))
    w = jnp.eye(4)[None]
    out = kpconv_ops.kpconv(pts, pts, inds, feats, kp, w, kp_extent=1.0)
    np.testing.assert_allclose(out, feats, atol=1e-5)


def test_kpconv_shadow_neighbors_ignored(rng):
    n = 4
    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    inds_full = jnp.concatenate([jnp.arange(n)[:, None], jnp.full((n, 2), n)], axis=1)
    inds_self = jnp.arange(n)[:, None]
    kp = jnp.zeros((1, 3))
    w = jnp.asarray(rng.randn(1, 4, 3).astype(np.float32))
    out_full = kpconv_ops.kpconv(pts, pts, inds_full, feats, kp, w, kp_extent=1.0)
    out_self = kpconv_ops.kpconv(pts, pts, inds_self, feats, kp, w, kp_extent=1.0)
    np.testing.assert_allclose(out_full, out_self, atol=1e-5)


def test_kpconv_linear_influence(rng):
    """Neighbor at distance d contributes (1 - d/extent)."""
    pts_q = jnp.zeros((1, 3))
    pts_s = jnp.asarray([[0.5, 0.0, 0.0]])
    feats = jnp.ones((1, 1))
    inds = jnp.zeros((1, 1), jnp.int32)
    kp = jnp.zeros((1, 3))
    w = jnp.ones((1, 1, 1))
    out = kpconv_ops.kpconv(pts_q, pts_s, inds, feats, kp, w, kp_extent=1.0)
    np.testing.assert_allclose(out, [[0.5]], atol=1e-5)


def test_kpconv_kernel_points_get_no_grad(rng):
    """Kernel dispositions are frozen constants (reference keeps them as
    requires_grad=False Parameters, `kpconv_blocks.py:99`). Their VJP branch
    must be severed: with a huge upstream cotangent it multiplies by the 1e6
    shadow offsets, overflows f32 and NaNs the global grad norm (regression:
    grad_norm=nan on the LINEMOD fixture's first train step)."""
    n = 5
    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(n, 2).astype(np.float32))
    # one real self-neighbor + two shadows per row
    inds = jnp.concatenate([jnp.arange(n)[:, None], jnp.full((n, 2), n)], axis=1)
    kp = jnp.asarray(rng.randn(4, 3).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(4, 2, 3).astype(np.float32))
    huge_cot = jnp.full((n, 3), 1e35, jnp.float32)

    def f(kp_, w_):
        out = kpconv_ops.kpconv(pts, pts, inds, feats, kp_, w_, kp_extent=1.0)
        return jnp.sum(out * huge_cot)

    g_kp, g_w = jax.grad(f, argnums=(0, 1))(kp, w)
    np.testing.assert_allclose(g_kp, np.zeros_like(g_kp))  # severed
    assert bool(jnp.isfinite(g_w).all())


def test_max_pool_and_closest_pool(rng):
    feats = jnp.asarray([[1.0, -2.0], [3.0, 0.5], [0.0, 7.0]])
    inds = jnp.asarray([[0, 1, 3], [2, 3, 3]])
    mp = kpconv_ops.max_pool(feats, inds)
    np.testing.assert_allclose(mp, [[3.0, 0.5], [0.0, 7.0]])
    cp = kpconv_ops.closest_pool(feats, inds)
    np.testing.assert_allclose(cp, [[1.0, -2.0], [0.0, 7.0]])


def test_scaled_crop_params_sample_halfres_field(rng):
    """Sampling a half-res field with crop_params/2 hits EXACTLY the same
    source locations as sampling a full-res field with crop_params: with
    align_corners=False, u_half = (u_full + 0.5)/2 - 0.5, which the window
    map absorbs as a pure params/2 rescale (refiner geofea_2d_scale path)."""
    import jax.numpy as jnp

    from rnnpose_tpu.geometry.crop import crop_source_coords
    from rnnpose_tpu.ops.sampler import bilinear_sample, separable_crop_sample

    im_half = jnp.asarray(rng.rand(2, 24, 24, 3).astype(np.float32))
    cp = jnp.asarray(
        [[20.0, 26.0, 9.0, 9.0], [25.5, 22.25, 7.5, 7.5]], jnp.float32
    )  # full-res-units crop windows (48x48 source image)
    S = 16
    got = separable_crop_sample(im_half, cp / 2.0, S)
    coords_full = crop_source_coords(cp, S)            # full-res coords
    coords_half = (coords_full + 0.5) / 2.0 - 0.5      # -> half-res coords
    want = bilinear_sample(im_half, coords_half)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
