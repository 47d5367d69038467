"""Shape/dtype/behavior tests for the neural network building blocks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # per-subnet integration compiles (~15 min CPU)

from rnnpose_tpu.models import raft, superpoint
from rnnpose_tpu.models.kpconv_net import KPConvConfig, KPFCNN
from rnnpose_tpu.data import pyramid as pyr_lib


def test_basic_encoder_shapes(rng):
    m = raft.BasicEncoder(output_dim=256)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 8, 8, 256)  # 1/8 resolution


def test_instance_norm_statistics(rng):
    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32) * 5 + 3)
    m = raft.InstanceNorm()
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    m = np.asarray(jnp.mean(y, axis=(1, 2)))
    s = np.asarray(jnp.std(y, axis=(1, 2)))
    np.testing.assert_allclose(m, 0.0, atol=1e-4)
    np.testing.assert_allclose(s, 1.0, atol=1e-3)


def test_sep_conv_gru_gate_behavior(rng):
    m = raft.SepConvGRU(hidden_dim=16)
    h = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    x = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), h, x)
    h2 = m.apply(params, h, x)
    assert h2.shape == h.shape
    # GRU output is bounded by construction (convex combo of h and tanh q),
    # so repeated application cannot blow up.
    for _ in range(5):
        h2 = m.apply(params, h2, x)
    assert np.abs(np.asarray(h2)).max() < 50


def test_update_block_shapes(rng):
    m = raft.BasicUpdateBlock(hidden_dim=128)
    B, H, W = 1, 8, 8
    h = jnp.zeros((B, H, W, 128))
    inp = jnp.zeros((B, H, W, 128))
    corr = jnp.zeros((B, H, W, 4 * 81))
    flow = jnp.zeros((B, H, W, 2))
    params = m.init(jax.random.PRNGKey(0), h, inp, corr, flow)
    h2, mask, dflow = m.apply(params, h, inp, corr, flow)
    assert h2.shape == (B, H, W, 128)
    assert mask.shape == (B, H, W, 64 * 9)
    assert dflow.shape == (B, H, W, 2)


def test_superpoint_shapes(rng):
    m = superpoint.SuperPoint2D(descriptor_dim=32)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    scores, desc = m.apply(params, x)
    assert scores.shape == (1, 32, 32, 1)
    assert desc.shape == (1, 32, 32, 32)
    assert 0.0 <= float(scores.min()) and float(scores.max()) <= 1.0
    norms = np.asarray(jnp.linalg.norm(desc, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_superpoint_skip_saliency_head(rng):
    """compute_scores=False skips the (unconsumed) saliency head: scores is
    None, the descriptors are BIT-identical to the full path, and the
    convPa/convPb params still exist for checkpoint conversion."""
    m = superpoint.SuperPoint2D(descriptor_dim=32)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    assert "convPa" in params["params"] and "convPb" in params["params"]
    _, desc_full = m.apply(params, x)
    scores, desc = m.apply(params, x, compute_scores=False)
    assert scores is None
    np.testing.assert_array_equal(np.asarray(desc), np.asarray(desc_full))


# ------------------------------------------------------------ pyramid (host)
def test_grid_subsample_reduces_and_covers(rng):
    pts = rng.rand(2000, 3).astype(np.float32)
    sub = pyr_lib.grid_subsample(pts, 0.25)
    assert 20 <= len(sub) <= 64  # 4^3 voxel grid
    # Barycenters stay inside the cloud bbox.
    assert (sub >= pts.min(0) - 1e-6).all() and (sub <= pts.max(0) + 1e-6).all()


def test_grid_subsample_single_voxel():
    pts = np.zeros((10, 3), np.float32)
    sub = pyr_lib.grid_subsample(pts, 0.1)
    assert sub.shape == (1, 3)


def test_radius_neighbors_ordered_and_shadowed(rng):
    q = np.zeros((1, 3), np.float32)
    s = np.asarray([[0.5, 0, 0], [0.1, 0, 0], [2.0, 0, 0], [0.3, 0, 0]], np.float32)
    nb = pyr_lib.radius_neighbors(q, s, radius=1.0, max_neighbors=4)
    assert nb.tolist() == [[1, 3, 0, 4]]  # sorted by distance; 2.0 excluded -> shadow 4


def test_build_pyramid_and_pad(rng):
    cfg = KPConvConfig(num_layers=3, first_subsampling_dl=0.05)
    clouds = [rng.rand(300, 3).astype(np.float32) * 0.5 for _ in range(2)]
    limits = pyr_lib.calibrate_neighbor_limits(clouds, cfg, untruncated_cap=64)
    assert len(limits) == 3 and all(1 <= l <= 64 for l in limits)
    pyrs = [pyr_lib.build_pyramid_arrays(c, cfg, limits) for c in clouds]
    batch = pyr_lib.pad_and_batch_pyramids(pyrs)
    assert len(batch.points) == 3
    for l in range(3):
        assert batch.points[l].shape[0] == 2
        assert batch.neighbors[l].shape[:2] == batch.points[l].shape[:2]
    assert len(batch.pools) == 2 and len(batch.upsamples) == 2


def test_kpfcnn_forward(rng):
    cfg = KPConvConfig(
        num_layers=3, first_subsampling_dl=0.05, first_feats_dim=16,
        final_feats_dim=8, gnn_feats_dim=16,
    )
    clouds = [rng.rand(200, 3).astype(np.float32) * 0.5 for _ in range(2)]
    pyrs = [pyr_lib.build_pyramid_arrays(c, cfg, [16, 16, 16]) for c in clouds]
    batch = pyr_lib.pad_and_batch_pyramids(pyrs)
    batch = jax.tree.map(jnp.asarray, batch)
    m = KPFCNN(cfg)
    params = m.init(jax.random.PRNGKey(0), batch)
    feats = m.apply(params, batch)
    assert feats.shape == (2, batch.points[0].shape[1], 8)
    # L2-normalized on valid points, zero on padding.
    norms = np.asarray(jnp.linalg.norm(feats, axis=-1))
    valid = np.asarray(batch.masks[0]) > 0
    np.testing.assert_allclose(norms[valid], 1.0, atol=1e-3)
    np.testing.assert_allclose(norms[~valid], 0.0, atol=1e-6)


def test_kpfcnn_padding_invariance(rng):
    """Adding padding must not change the features of real points."""
    cfg = KPConvConfig(
        num_layers=2, first_subsampling_dl=0.05, first_feats_dim=8,
        final_feats_dim=4, gnn_feats_dim=8,
    )
    cloud = rng.rand(100, 3).astype(np.float32) * 0.4
    p = pyr_lib.build_pyramid_arrays(cloud, cfg, [12, 12])
    b1 = pyr_lib.pad_and_batch_pyramids([p])
    sizes = [s + 37 for s in [b1.points[0].shape[1], b1.points[1].shape[1]]]
    b2 = pyr_lib.pad_and_batch_pyramids([p], level_sizes=sizes)
    m = KPFCNN(cfg)
    b1j = jax.tree.map(jnp.asarray, b1)
    b2j = jax.tree.map(jnp.asarray, b2)
    params = m.init(jax.random.PRNGKey(0), b1j)
    f1 = np.asarray(m.apply(params, b1j))
    f2 = np.asarray(m.apply(params, b2j))
    n_real = len(p.points[0])
    np.testing.assert_allclose(f1[0, :n_real], f2[0, :n_real], atol=1e-4)


def test_kpfcnn_backward_finite_with_padding(rng):
    """The output L2-normalize must be NaN-safe at padded rows: their
    features are exactly zero (bias-free last_unary on zeroed inputs) and
    d||x||/dx at 0 is NaN unless the *squared* norm is clamped (regression:
    grad_norm=nan on the LINEMOD fixture's first train step)."""
    cfg = KPConvConfig(
        num_layers=2, first_subsampling_dl=0.05, first_feats_dim=8,
        final_feats_dim=4, gnn_feats_dim=8,
    )
    cloud = rng.rand(80, 3).astype(np.float32) * 0.4
    p = pyr_lib.build_pyramid_arrays(cloud, cfg, [12, 12])
    sizes = [s + 17 for s in (len(p.points[0]), len(p.points[1]))]
    batch = jax.tree.map(
        jnp.asarray, pyr_lib.pad_and_batch_pyramids([p], level_sizes=sizes)
    )
    m = KPFCNN(cfg)
    params = m.init(jax.random.PRNGKey(0), batch)
    g = jax.grad(lambda pr: jnp.sum(m.apply(pr, batch)))(params)
    assert all(
        bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(g)
    )
