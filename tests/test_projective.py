import jax
import jax.numpy as jnp
import numpy as np

from rnnpose_tpu.geometry import projective as proj
from rnnpose_tpu.geometry import se3

K_VEC = jnp.asarray([572.4114, 573.57043, 325.2611, 242.04899])  # LINEMOD


def test_coords_grid():
    g = proj.coords_grid(4, 6)
    assert g.shape == (4, 6, 2)
    np.testing.assert_allclose(g[2, 3], [3.0, 2.0])


def test_backproject_project_roundtrip(rng):
    depth = jnp.asarray(rng.uniform(0.5, 2.0, (2, 8, 8)).astype(np.float32))
    pts = proj.backproject(depth, K_VEC[None])
    uv, _ = proj.project(pts, K_VEC[None, None, None])
    grid = proj.coords_grid(8, 8)
    np.testing.assert_allclose(uv, np.broadcast_to(grid, uv.shape), atol=1e-3)


def test_project_jacobian_matches_autodiff(rng):
    pts = jnp.asarray(rng.uniform(-1, 1, (16, 3)).astype(np.float32))
    pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 0.5)

    _, jac = proj.project(pts, K_VEC[None], jacobian=True)

    def f(p):
        return proj.project(p, K_VEC)[0]

    jac_ad = jax.vmap(jax.jacfwd(f))(pts)
    np.testing.assert_allclose(jac, jac_ad, atol=1e-3, rtol=1e-4)


def test_project_behind_camera_zeroed():
    pts = jnp.asarray([[0.5, 0.5, -1.0], [0.5, 0.5, 0.001]])
    uv, jac = proj.project(pts, K_VEC[None], jacobian=True)
    # Invalid points project to the principal point with zero Jacobian.
    np.testing.assert_allclose(uv[0], [K_VEC[2], K_VEC[3]], atol=1e-4)
    np.testing.assert_allclose(jac[0], np.zeros((2, 3)), atol=1e-6)


def test_transform_points(rng):
    xi = jnp.asarray(rng.randn(2, 6).astype(np.float32) * 0.3)
    T = se3.se3_expm(xi)
    pts = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    out = proj.transform_points(T, pts)
    for b in range(2):
        expected = pts[b] @ np.asarray(T[b, :3, :3]).T + np.asarray(T[b, :3, 3])
        np.testing.assert_allclose(out[b], expected, atol=1e-5)


def test_local_perturb_jacobian_matches_autodiff(rng):
    Y = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    jac = proj.local_perturb_jacobian(Y)

    def f(xi, y):
        return proj.transform_points(se3.se3_expm(xi), y)

    jac_ad = jax.vmap(lambda y: jax.jacfwd(f)(jnp.zeros(6), y))(Y)
    np.testing.assert_allclose(jac, jac_ad, atol=1e-4)


def test_intrinsics_vec_matrix_roundtrip():
    K = proj.intrinsics_vec_to_matrix(K_VEC)
    v = proj.intrinsics_matrix_to_vec(K)
    np.testing.assert_allclose(v, K_VEC, atol=1e-6)


def test_normalize_coords():
    g = proj.coords_grid(5, 9)
    n = proj.normalize_coords(g, 5, 9)
    np.testing.assert_allclose(n[0, 0], [-1, -1], atol=1e-6)
    np.testing.assert_allclose(n[4, 8], [1, 1], atol=1e-6)
