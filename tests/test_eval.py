import jax.numpy as jnp
import numpy as np
import pytest

from rnnpose_tpu.eval import metrics as M
from rnnpose_tpu.eval.evaluator import PoseEvaluator
from rnnpose_tpu.parallel.collectives import weighted_reduce_metrics


def rand_pose(rng):
    from scipy.spatial.transform import Rotation

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.random(random_state=rng).as_matrix()
    T[:3, 3] = rng.randn(3) * 0.1 + [0, 0, 0.8]
    return T


def test_add_zero_for_identical(rng):
    T = rand_pose(rng)[None]
    pts = jnp.asarray(rng.randn(1, 100, 3).astype(np.float32) * 0.05)
    err = M.add_error(
        jnp.asarray(T[:, :3, :3]), jnp.asarray(T[:, :3, 3]),
        jnp.asarray(T[:, :3, :3]), jnp.asarray(T[:, :3, 3]), pts,
    )
    np.testing.assert_allclose(err, 0.0, atol=1e-6)


def test_add_translation_only(rng):
    T = rand_pose(rng)[None]
    T2 = T.copy()
    T2[:, :3, 3] += [0.01, 0, 0]
    pts = jnp.asarray(rng.randn(1, 50, 3).astype(np.float32) * 0.05)
    err = M.add_error(
        jnp.asarray(T2[:, :3, :3]), jnp.asarray(T2[:, :3, 3]),
        jnp.asarray(T[:, :3, :3]), jnp.asarray(T[:, :3, 3]), pts,
    )
    np.testing.assert_allclose(err, 0.01, atol=1e-5)


def test_adds_symmetric_rotation(rng):
    """A ring of points rotated about its symmetry axis: ADD large, ADD-S ~ 0."""
    theta = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    pts = np.stack(
        [np.cos(theta), np.sin(theta), np.zeros_like(theta)], axis=-1
    ).astype(np.float32)[None] * 0.05
    ang = 2 * np.pi / 64 * 7  # rotate by exactly 7 steps -> same point set
    Rz = np.asarray(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )[None]
    eye = np.eye(3, dtype=np.float32)[None]
    t = np.zeros((1, 3), np.float32)
    add = M.add_error(jnp.asarray(Rz), jnp.asarray(t), jnp.asarray(eye), jnp.asarray(t), jnp.asarray(pts))
    adds = M.adds_error(jnp.asarray(Rz), jnp.asarray(t), jnp.asarray(eye), jnp.asarray(t), jnp.asarray(pts))
    assert float(add[0]) > 0.01
    assert float(adds[0]) < 1e-5


def test_rotation_error_deg(rng):
    ang = np.radians(10.0)
    Rz = np.asarray(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ],
        np.float32,
    )[None]
    eye = np.eye(3, dtype=np.float32)[None]
    err = M.rotation_error_deg(jnp.asarray(Rz), jnp.asarray(eye))
    np.testing.assert_allclose(err, 10.0, atol=1e-3)


def test_projection_2d_error(rng):
    K = jnp.asarray([[500.0, 500.0, 100.0, 100.0]])
    T = np.eye(4, dtype=np.float32)[None]
    T[:, 2, 3] = 1.0
    T2 = T.copy()
    T2[:, 0, 3] += 0.002  # 2mm at 1m with f=500 -> 1 px
    pts = jnp.zeros((1, 10, 3))
    err = M.projection_2d_error(
        jnp.asarray(T2[:, :3, :3]), jnp.asarray(T2[:, :3, 3]),
        jnp.asarray(T[:, :3, :3]), jnp.asarray(T[:, :3, 3]), pts, K,
    )
    np.testing.assert_allclose(err, 1.0, atol=1e-3)


def test_evaluator_accumulates_and_thresholds(rng):
    pts = rng.randn(200, 3).astype(np.float32) * 0.05
    ev = PoseEvaluator("cat", diameter=0.152633, model_points=pts)
    T = rand_pose(rng)[None]
    K = np.asarray([[572.0, 573.0, 325.0, 242.0]], np.float32)
    ev.evaluate(T, T, K)  # perfect
    bad = T.copy()
    bad[:, :3, 3] += 0.1  # 10 cm off: fails all ADD thresholds
    ev.evaluate(bad, T, K)
    s = ev.summarize()
    assert s["seq_len"] == 2
    assert s["add01"] == 0.5
    assert s["cm5deg5"] == 0.5


def test_evaluator_symmetric_class_uses_adds(rng):
    theta = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    ring = np.stack(
        [np.cos(theta), np.sin(theta), np.zeros_like(theta)], axis=-1
    ).astype(np.float32) * 0.08
    ev_sym = PoseEvaluator("glue", diameter=0.164857, model_points=ring)
    ev_asym = PoseEvaluator("cat", diameter=0.164857, model_points=ring)
    ang = 2 * np.pi / 64 * 9
    T_gt = np.eye(4, dtype=np.float32)[None]
    T_pred = T_gt.copy()
    T_pred[0, :3, :3] = [
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ]
    K = np.asarray([[572.0, 573.0, 325.0, 242.0]], np.float32)
    ev_sym.evaluate(T_pred, T_gt, K)
    ev_asym.evaluate(T_pred, T_gt, K)
    assert ev_sym.summarize()["add01"] == 1.0     # ADD-S forgives symmetry
    assert ev_asym.summarize()["add01"] == 0.0    # plain ADD does not


def test_weighted_reduce_metrics():
    a = {"add01": 1.0, "seq_len": 3}
    b = {"add01": 0.0, "seq_len": 1}
    out = weighted_reduce_metrics([a, b])
    np.testing.assert_allclose(out["add01"], 0.75)
    assert out["seq_len"] == 4
