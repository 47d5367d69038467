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


def test_icp_refine_recovers_perturbation(rng):
    """ICP pulls a perturbed pose back onto a synthetic scene cloud."""
    import jax.numpy as jnp
    from rnnpose_tpu.eval.icp import icp_refine
    from rnnpose_tpu.geometry import se3 as se3_lib

    n = 400
    pts = rng.randn(1, n, 3).astype(np.float32) * 0.05
    T_gt = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    T_gt[0, :3, 3] = [0.02, -0.01, 0.6]
    scene = (pts[0] @ T_gt[0, :3, :3].T + T_gt[0, :3, 3])[None]

    xi = jnp.asarray([[0.004, -0.003, 0.005, 0.02, -0.015, 0.01]], jnp.float32)
    T0 = np.asarray(se3_lib.se3_increment(jnp.asarray(T_gt), xi))

    T_ref = np.asarray(
        icp_refine(jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(scene),
                   num_iters=15, max_corr_dist=0.05)
    )
    err0 = np.abs(T0 - T_gt).max()
    err1 = np.abs(T_ref - T_gt).max()
    assert err1 < err0 * 0.2, (err0, err1)


def test_icp_refine_ignores_padding(rng):
    import jax.numpy as jnp
    from rnnpose_tpu.eval.icp import icp_refine

    pts = rng.randn(1, 100, 3).astype(np.float32) * 0.05
    scene = pts + np.asarray([0.0, 0.0, 0.5], np.float32)
    # Poison the padded halves; masks must exclude them.
    mpts = np.concatenate([pts, np.full((1, 50, 3), 77.0, np.float32)], 1)
    spts = np.concatenate([scene, np.full((1, 60, 3), -55.0, np.float32)], 1)
    mval = np.concatenate([np.ones((1, 100)), np.zeros((1, 50))], 1)
    sval = np.concatenate([np.ones((1, 100)), np.zeros((1, 60))], 1)
    T0 = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    T0[0, 2, 3] = 0.48  # 2 cm off along z
    T = np.asarray(
        icp_refine(jnp.asarray(T0), jnp.asarray(mpts), jnp.asarray(spts),
                   model_valid=jnp.asarray(mval), scene_valid=jnp.asarray(sval),
                   num_iters=10, max_corr_dist=0.05)
    )
    assert abs(T[0, 2, 3] - 0.5) < 1e-3
    assert np.abs(T[0, :3, :3] - np.eye(3)).max() < 1e-3


def test_evaluator_icp_improves_add(rng):
    from rnnpose_tpu.eval.evaluator import PoseEvaluator

    pts = rng.randn(300, 3).astype(np.float32) * 0.04
    T_gt = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    T_gt[0, :3, 3] = [0.0, 0.0, 0.55]
    scene = (pts @ T_gt[0, :3, :3].T + T_gt[0, :3, 3])[None]
    T0 = T_gt.copy()
    T0[0, 0, 3] += 0.01  # 1 cm x error
    K = np.asarray([[280.0, 280.0, 120.0, 120.0]], np.float32)

    plain = PoseEvaluator("cat", 0.15, pts)
    plain.evaluate(T0, T_gt, K)
    with_icp = PoseEvaluator("cat", 0.15, pts, icp_refine=True, icp_iters=12,
                             icp_max_corr_dist=0.05)
    with_icp.evaluate(T0, T_gt, K, scene_points=scene)
    assert with_icp.summarize()["add_dist"] < plain.summarize()["add_dist"] * 0.2


def test_ycb_evaluator_auc_and_symmetry(rng):
    from rnnpose_tpu.eval.evaluator import YCBEvaluator

    pts = rng.randn(200, 3).astype(np.float32) * 0.04
    T_gt = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    T_gt[:, 2, 3] = 0.6
    T_pred = T_gt.copy()
    T_pred[0, 0, 3] += 0.01   # 1 cm error
    T_pred[1, 0, 3] += 0.25   # beyond the 0.1 m AUC range
    K = np.tile(np.asarray([[280.0, 280.0, 120.0, 120.0]], np.float32), (2, 1))

    ev = YCBEvaluator("024_bowl", 0.16, pts)
    assert ev.symmetric  # YCB symmetric table, not the LINEMOD one
    ev.evaluate(T_pred, T_gt, K)
    s = ev.summarize()
    # sample 0: ~1 cm -> auc contribution ~0.9; sample 1: clipped to 0.
    assert 0.40 < s["adds_auc"] < 0.50
    assert s["adds2cm"] == 0.5
    assert "add_auc" in s

    ev2 = YCBEvaluator("011_banana", 0.2, pts)
    assert not ev2.symmetric
