"""A/B the evaluator against the reference's own `LineMODEvaluator`.

`eval/metrics.py` + `eval/evaluator.py` were golden-tested (synthetic
rotations, hand-derived thresholds) but a protocol bug — wrong diameter
unit, ADD-S matching direction, fixed-vs-per-frame K in Proj2D — would slip
through goldens written to the same misunderstanding. Here the SAME pose
pairs are pushed through the reference evaluator code itself
(`/root/reference/utils/eval_metric.py:59-356`) and through ours, and every
counter must agree exactly.

Reference quirks reproduced deliberately:
  * Proj2D uses the FIXED LINEMOD K (`eval_metric.py:337`,
    `data/linemod/linemod_config.py:23`), not the per-frame K — on real
    LINEMOD frames they coincide; the A/B passes the same K to both sides.
  * symmetric classes (eggbox, glue) switch ADD to nearest-point matching
    with the prediction as the reference set and GT as queries
    (`eval_metric.py:166-171`: `model_pred[idxs] - model_targets`).
  * the CUDA `find_nearest_point_idx` (`thirdparty/nn/nn_utils.py:6-21`)
    is replaced by an exact scipy cKDTree equivalent (same brute-force NN
    semantics; CUDA is unavailable here).
"""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # imports the torch reference

from tests.reference_shim import install_reference


def _install_eval_metric_shims():
    """Extra sys.modules shims for `utils/eval_metric.py`'s import graph."""
    install_reference()

    if "open3d" not in sys.modules:
        m = types.ModuleType("open3d")
        m.__path__ = []
        sys.modules["open3d"] = m

    if "torchvision" not in sys.modules:
        # `data/__init__.py` -> `data/transforms.py` imports torchvision at
        # module scope; the eval A/B only touches `data.linemod.linemod_config`
        # (pure constants), so inert placeholders suffice.
        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        tr = types.ModuleType("torchvision.transforms")
        tr.__path__ = []
        fn = types.ModuleType("torchvision.transforms.functional")
        tr.functional = fn
        tr.ColorJitter = object
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = fn

    if "thirdparty.nn.nn_utils" not in sys.modules:
        from scipy.spatial import cKDTree

        def find_nearest_point_idx(ref_pts, que_pts):
            # Exact NN indices of each query point in ref_pts — the same
            # contract as the reference CUDA kernel
            # (`thirdparty/nn/src/nearest_neighborhood.cu:48-83`).
            return cKDTree(np.asarray(ref_pts)).query(np.asarray(que_pts))[1]

        nn_utils = types.ModuleType("thirdparty.nn.nn_utils")
        nn_utils.find_nearest_point_idx = find_nearest_point_idx
        pkg = sys.modules.get("thirdparty.nn")
        if pkg is None:
            pkg = types.ModuleType("thirdparty.nn")
            pkg.__path__ = []
            sys.modules["thirdparty.nn"] = pkg
        pkg.nn_utils = nn_utils
        sys.modules["thirdparty.nn.nn_utils"] = nn_utils


def _make_pose_pairs(rs, n, t_gt_z=0.6):
    """GT poses + perturbed predictions spanning the metric thresholds:
    rotation errors log-spaced ~0.2-40 deg, translation ~0.2-80 mm."""
    from scipy.spatial.transform import Rotation

    T_gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    T_pred = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    ang = np.exp(rs.uniform(np.log(0.2), np.log(40.0), size=n))
    trans = np.exp(rs.uniform(np.log(2e-4), np.log(8e-2), size=n))
    for i in range(n):
        Rg = Rotation.random(random_state=rs).as_matrix()
        T_gt[i, :3, :3] = Rg
        T_gt[i, :3, 3] = [rs.uniform(-0.05, 0.05), rs.uniform(-0.05, 0.05),
                          t_gt_z * rs.uniform(0.9, 1.1)]
        axis = rs.randn(3)
        axis /= np.linalg.norm(axis)
        dR = Rotation.from_rotvec(axis * np.deg2rad(ang[i])).as_matrix()
        dt = rs.randn(3)
        dt *= trans[i] / np.linalg.norm(dt)
        T_pred[i] = T_gt[i].copy()
        T_pred[i, :3, :3] = dR @ T_gt[i, :3, :3]
        T_pred[i, :3, 3] += dt
    return T_pred, T_gt


def _load_reference_eval_metric():
    _install_eval_metric_shims()
    import importlib

    return importlib.import_module("utils.eval_metric")


def _make_model_points(rs, n_pts=512, radius=0.08):
    """Blobby point cloud with diameter ~= the class diameter scale."""
    pts = rs.randn(n_pts, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= radius * rs.uniform(0.5, 1.0, size=(n_pts, 1))
    return pts.astype(np.float64)


@pytest.mark.parametrize("class_name", ["cat", "eggbox"])
def test_evaluator_matches_reference(class_name, tmp_path, monkeypatch):
    em = _load_reference_eval_metric()
    from data.linemod import linemod_config as ref_lmcfg

    rs = np.random.RandomState(42 if class_name == "cat" else 43)
    model_pts = _make_model_points(rs)
    diameter = float(ref_lmcfg.diameters[class_name]) / 100.0  # cm -> m
    K = ref_lmcfg.linemod_K.astype(np.float64)
    n = 120
    T_pred, T_gt = _make_pose_pairs(rs, n)

    # ---- reference side: exactly what evaluate_rnnpose does per frame
    # (`eval_metric.py:305-356`), minus the model forward/vis ----
    monkeypatch.setattr(em, "get_ply_model", lambda p, scale=1: model_pts)
    monkeypatch.setattr(
        em.inout, "load_ply", lambda p: {"pts": model_pts.copy()}
    )
    ref_ev = em.LineMODEvaluator(class_name, str(tmp_path))
    assert abs(ref_ev.diameter - diameter) < 1e-12
    syn = class_name in ("eggbox", "glue")
    for i in range(n):
        pose_pred = T_pred[i, :3, :4]
        pose_gt = T_gt[i, :3, :4]
        ref_ev.add_metric(pose_pred, pose_gt, syn=syn)
        ref_ev.add2_metric(pose_pred, pose_gt, syn=syn)
        ref_ev.add5_metric(pose_pred, pose_gt, syn=syn)
        ref_ev.projection_2d(pose_pred, pose_gt, K=K)
        ref_ev.cm_degree_5_metric(pose_pred, pose_gt)
    # summarize() prints + np.mean([]) warns on the unused mask_ap; keep the
    # counters before it clears them.
    ref = {
        "add01": float(np.mean(ref_ev.add)),
        "add005": float(np.mean(ref_ev.add5)),
        "add002": float(np.mean(ref_ev.add2)),
        "proj5": float(np.mean(ref_ev.proj2d)),
        "cm5deg5": float(np.mean(ref_ev.cmd5)),
        "seq_len": len(ref_ev.add),
    }
    summ = ref_ev.summarize()
    assert summ["add"] == ref["add01"] and summ["seq_len"] == ref["seq_len"]

    # ---- our side: one batched evaluate over the identical poses ----
    from rnnpose_tpu.eval.evaluator import PoseEvaluator

    ours_ev = PoseEvaluator(
        class_name=class_name, diameter=diameter, model_points=model_pts
    )
    K_vec = np.tile(
        np.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float64)[None],
        (n, 1),
    )
    ours_ev.evaluate(T_pred, T_gt, K_vec)
    ours = ours_ev.summarize()

    assert ours["seq_len"] == ref["seq_len"]
    for k in ("add01", "add005", "add002", "proj5", "cm5deg5"):
        assert ours[k] == ref[k], (
            f"{class_name}.{k}: ours {ours[k]} != reference {ref[k]}"
        )

    # The counters must span (0, 1) for the A/B to have teeth: if every pose
    # passes (or fails) every threshold, unit bugs cancel out.
    for k in ("add01", "add005", "add002", "proj5", "cm5deg5"):
        assert 0.0 < ref[k] < 1.0, f"{k} saturated at {ref[k]}; resample"


@pytest.mark.parametrize("class_name", ["cat", "eggbox"])
def test_per_pose_distances_match_reference(class_name, tmp_path, monkeypatch):
    """Beyond boolean counters: the underlying per-pose ADD(-S) distances and
    the 5cm5deg ingredients agree to f32 tolerance."""
    em = _load_reference_eval_metric()
    from data.linemod import linemod_config as ref_lmcfg

    rs = np.random.RandomState(7)
    model_pts = _make_model_points(rs)
    n = 40
    T_pred, T_gt = _make_pose_pairs(rs, n)
    syn = class_name in ("eggbox", "glue")

    monkeypatch.setattr(em, "get_ply_model", lambda p, scale=1: model_pts)
    monkeypatch.setattr(
        em.inout, "load_ply", lambda p: {"pts": model_pts.copy()}
    )
    ref_ev = em.LineMODEvaluator(class_name, str(tmp_path))

    # Reference per-pose mean distance, re-derived exactly as add_metric
    # computes it (`eval_metric.py:160-178`).
    ref_d = []
    for i in range(n):
        pp, pg = T_pred[i, :3, :4], T_gt[i, :3, :4]
        mp = model_pts @ pp[:, :3].T + pp[:, 3]
        mt = model_pts @ pg[:, :3].T + pg[:, 3]
        if syn:
            from thirdparty.nn import nn_utils

            idxs = nn_utils.find_nearest_point_idx(mp, mt)
            ref_d.append(float(np.mean(np.linalg.norm(mp[idxs] - mt, 2, 1))))
        else:
            ref_d.append(float(np.mean(np.linalg.norm(mp - mt, axis=-1))))

    from rnnpose_tpu.eval.evaluator import PoseEvaluator

    ours_ev = PoseEvaluator(
        class_name=class_name,
        diameter=float(ref_lmcfg.diameters[class_name]) / 100.0,
        model_points=model_pts,
    )
    K = ref_lmcfg.linemod_K
    K_vec = np.tile(
        np.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float64)[None],
        (n, 1),
    )
    ours_ev.evaluate(T_pred, T_gt, K_vec)
    ours_d = [r["add_dist"] for r in ours_ev._records]
    # atol 1e-5 m: our NN matmul runs in f32 (as does the reference's own
    # CUDA kernel, which casts to float32 — `nn_utils.py:12-13`), so
    # near-tied neighbors can resolve differently from the f64 oracle; the
    # resulting distance differences are ~4e-6 m vs 3.5e-3 m thresholds.
    np.testing.assert_allclose(ours_d, ref_d, rtol=2e-5, atol=1e-5)
    assert ref_ev is not None
