import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnpose_tpu.geometry import se3


def random_twists(rng, n=8, scale=1.0):
    return jnp.asarray(rng.randn(n, 6).astype(np.float32) * scale)


def test_expm_identity():
    T = se3.se3_expm(jnp.zeros((4, 6)))
    np.testing.assert_allclose(T, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-6)


def test_expm_logm_roundtrip(rng):
    xi = random_twists(rng, scale=0.8)
    T = se3.se3_expm(xi)
    xi2 = se3.se3_logm(T)
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_expm_matches_scipy(rng):
    from scipy.linalg import expm as scipy_expm

    xi = random_twists(rng, n=16, scale=1.5)
    T = np.asarray(se3.se3_expm(xi))
    for i in range(16):
        X = np.asarray(se3.hat(xi[i]))
        np.testing.assert_allclose(T[i], scipy_expm(X), atol=1e-4)


def test_expm_tiny_angle_stable(rng):
    xi = random_twists(rng, scale=1e-6)
    T = se3.se3_expm(xi)
    assert np.all(np.isfinite(np.asarray(T)))
    # Near identity: T ~ I + hat(xi)
    approx = np.broadcast_to(np.eye(4), T.shape) + np.asarray(se3.hat(xi))
    np.testing.assert_allclose(T, approx, atol=1e-9)


def test_expm_grad_finite_everywhere(rng):
    # Gradients must be NaN-free including at exactly zero twist.
    def f(xi):
        return jnp.sum(se3.se3_expm(xi) ** 2)

    g0 = jax.grad(f)(jnp.zeros((6,)))
    assert np.all(np.isfinite(np.asarray(g0)))
    g1 = jax.grad(f)(random_twists(rng, n=1)[0])
    assert np.all(np.isfinite(np.asarray(g1)))


def test_expm_grad_matches_fd(rng):
    xi0 = random_twists(rng, n=1, scale=0.3)[0]

    def f(xi):
        return jnp.sum(jnp.sin(se3.se3_expm(xi)))

    g = np.asarray(jax.grad(f)(xi0))
    eps = 1e-3
    for k in range(6):
        e = np.zeros(6, np.float32)
        e[k] = eps
        fd = (f(xi0 + e) - f(xi0 - e)) / (2 * eps)
        np.testing.assert_allclose(g[k], fd, atol=2e-3)


def test_inverse(rng):
    xi = random_twists(rng)
    T = se3.se3_expm(xi)
    TinvT = se3.se3_inverse(T) @ T
    np.testing.assert_allclose(
        TinvT, np.broadcast_to(np.eye(4), TinvT.shape), atol=1e-5
    )


def test_increment_left_multiplicative(rng):
    xi = random_twists(rng, n=2, scale=0.5)
    T = se3.se3_expm(xi)
    delta = random_twists(rng, n=2, scale=0.1)
    T2 = se3.se3_increment(T, delta)
    np.testing.assert_allclose(T2, se3.se3_expm(delta) @ T, atol=1e-6)


def test_approx_grad_matches_exact_near_identity(rng):
    # The reference's generator-projection VJP is first-order accurate near 0;
    # check it agrees with the exact gradient there.
    xi0 = random_twists(rng, n=1, scale=1e-3)[0]
    g_target = jnp.asarray(rng.randn(4, 4).astype(np.float32))

    def f_exact(xi):
        return jnp.sum(se3.se3_expm(xi) * g_target)

    def f_approx(xi):
        return jnp.sum(se3.se3_expm_approx_grad(xi) * g_target)

    g1 = np.asarray(jax.grad(f_exact)(xi0))
    g2 = np.asarray(jax.grad(f_approx)(xi0))
    np.testing.assert_allclose(g1, g2, atol=1e-2, rtol=1e-2)


def test_quat_matrix_roundtrip(rng):
    q = rng.randn(32, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.where(q[:, :1] < 0, -1.0, 1.0)
    R = se3.quat_to_matrix(jnp.asarray(q))
    q2 = np.asarray(se3.matrix_to_quat(R))
    np.testing.assert_allclose(q, q2, atol=1e-4)


def test_quat_to_matrix_orthogonal(rng):
    q = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    R = se3.quat_to_matrix(q)
    RtR = jnp.swapaxes(R, -1, -2) @ R
    np.testing.assert_allclose(
        RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5
    )


def test_se3_from_quat_trans(rng):
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t = jnp.asarray([1.0, 2.0, 3.0])
    T = se3.se3_from_quat_trans(q, t)
    expected = np.eye(4)
    expected[:3, 3] = [1, 2, 3]
    np.testing.assert_allclose(T, expected, atol=1e-6)
