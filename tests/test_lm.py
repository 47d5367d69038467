"""LM solver parity tests: convergence on synthetic correspondences."""
import jax
import jax.numpy as jnp
import numpy as np

from rnnpose_tpu.geometry import lm, projective as proj, se3

K_VEC = jnp.asarray([572.4114, 573.57043, 325.2611, 242.04899]) / 2.0


def make_problem(rng, b=2, h=32, w=32, twist_scale=0.05):
    """Synthetic scene: random depth, GT relative pose, exact target coords."""
    depth = jnp.asarray(rng.uniform(0.5, 1.5, (b, h, w)).astype(np.float32))
    xi_gt = jnp.asarray(rng.randn(b, 6).astype(np.float32) * twist_scale)
    T_gt = se3.se3_expm(xi_gt)
    intr = jnp.broadcast_to(K_VEC, (b, 4))
    target, valid = lm.pose_transform_coords(T_gt, depth, intr)
    weight = jnp.ones((b, h, w, 2)) * valid[..., None]
    return depth, T_gt, intr, target, weight


def test_solve_spd_accuracy(rng):
    A = rng.randn(4, 6, 6).astype(np.float32)
    H = np.einsum("bij,bkj->bik", A, A) + 1e-2 * np.eye(6)
    x_gt = rng.randn(4, 6).astype(np.float32) * 0.1
    bvec = np.einsum("bij,bj->bi", H, x_gt)
    x = lm.solve_spd(jnp.asarray(H), jnp.asarray(bvec), delta_clamp=10.0)
    np.testing.assert_allclose(x, x_gt, atol=1e-3, rtol=1e-3)


def test_solve_spd_badly_scaled(rng):
    """Jacobi preconditioning must handle px^2-vs-metric scale mismatch."""
    scales = np.array([1e4, 1e4, 1e4, 1.0, 1.0, 1.0], np.float32)
    A = rng.randn(2, 6, 6).astype(np.float32)
    H = np.einsum("bij,bkj->bik", A, A) + np.eye(6)
    H = H * scales[None, :, None] * scales[None, None, :]
    x_gt = rng.randn(2, 6).astype(np.float32) / scales
    bvec = np.einsum("bij,bj->bi", H, x_gt)
    x = lm.solve_spd(jnp.asarray(H), jnp.asarray(bvec), delta_clamp=10.0)
    np.testing.assert_allclose(x, x_gt, atol=1e-5, rtol=1e-2)


def test_solve_spd_nan_protection():
    H = jnp.zeros((1, 6, 6))  # singular -> NaN/Inf from cholesky
    b = jnp.ones((1, 6))
    x = lm.solve_spd(H, b)
    np.testing.assert_allclose(x, np.zeros((1, 6)))


def test_lm_converges_to_gt_pose(rng):
    depth, T_gt, intr, target, weight = make_problem(rng)
    T0 = jnp.broadcast_to(jnp.eye(4), T_gt.shape)
    cfg = lm.LMConfig(ep_lambda=1e-3, lm_lambda=1e-4)
    T = lm.reprojection_optim(T0, target, weight, depth, intr, num_iters=8, cfg=cfg)
    err = np.abs(np.asarray(T - T_gt)).max()
    assert err < 5e-3, f"LM did not converge: max err {err}"


def test_lm_reference_damping_converges(rng):
    # With the reference's heavy damping (EP=100) a few iters still reduce err.
    depth, T_gt, intr, target, weight = make_problem(rng, twist_scale=0.03)
    T0 = jnp.broadcast_to(jnp.eye(4), T_gt.shape)
    T = lm.reprojection_optim(T0, target, weight, depth, intr, num_iters=4)
    err0 = np.abs(np.asarray(T0 - T_gt)).max()
    err = np.abs(np.asarray(T - T_gt)).max()
    assert err < err0 * 0.5


def test_lm_is_differentiable(rng):
    depth, T_gt, intr, target, weight = make_problem(rng)
    T0 = jnp.broadcast_to(jnp.eye(4), T_gt.shape)

    def loss(tgt):
        T = lm.reprojection_optim(T0, tgt, weight, depth, intr, num_iters=2)
        return jnp.sum((T - T_gt) ** 2)

    g = jax.grad(loss)(target)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_lm_jits(rng):
    depth, T_gt, intr, target, weight = make_problem(rng)
    T0 = jnp.broadcast_to(jnp.eye(4), T_gt.shape)
    f = jax.jit(
        lambda *a: lm.reprojection_optim(*a, num_iters=2)
    )
    T = f(T0, target, weight, depth, intr)
    assert T.shape == T_gt.shape


def test_induced_flow_zero_for_identity(rng):
    depth = jnp.asarray(rng.uniform(0.5, 2.0, (1, 16, 16)).astype(np.float32))
    flow, valid = lm.induced_flow(
        jnp.eye(4)[None], depth, jnp.broadcast_to(K_VEC, (1, 4))
    )
    np.testing.assert_allclose(flow, np.zeros_like(flow), atol=1e-3)
    np.testing.assert_allclose(valid, np.ones((1, 16, 16)))
