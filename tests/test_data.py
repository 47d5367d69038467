import os
import pickle

import numpy as np
import pytest

from rnnpose_tpu.data import preprocess as prep
from rnnpose_tpu.data import poses as poses_lib
from rnnpose_tpu.data.linemod_config import DIAMETERS_CM, LINEMOD_K, diameter_m
from rnnpose_tpu.data.samplers import GivenIterationSampler, SequentialShardSampler
from rnnpose_tpu.data.transforms import color_jitter, make_transforms, random_blur
from rnnpose_tpu.utils.config_io import AttrDict, merge_cfg, save_cfg, update_dict
from rnnpose_tpu.config.defaults import (
    build_model_config,
    build_optimizer_config,
    default_config,
)


# ------------------------------------------------------------- preprocess
def test_normalize_model_consistency(rng):
    pts = rng.randn(100, 3).astype(np.float32) * 0.1
    RT = np.eye(3, 4, dtype=np.float32)
    RT[:, 3] = [0.1, -0.05, 0.8]
    pts_n, RT_n, center, scale = prep.normalize_model(pts, RT)
    # camera points of normalized system must equal original up to 1/s... the
    # reference convention keeps the pose metric: R (X - c) + (R c + t) = R X + t
    cam_orig = pts @ RT[:, :3].T + RT[:, 3]
    cam_norm = (pts_n * scale) @ RT_n[:, :3].T + RT_n[:, 3]
    np.testing.assert_allclose(cam_orig, cam_norm, atol=1e-5)


def test_lift_roundtrip(rng):
    pts = rng.randn(50, 3).astype(np.float32) * 0.1
    RT = np.eye(3, 4, dtype=np.float32)
    RT[:, 3] = [0.0, 0.0, 0.9]
    pts_n, RT_n, center, scale = prep.normalize_model(pts, RT)
    cam = pts @ RT[:, :3].T + RT[:, 3]
    lifted = prep.lift_to_model_frame(cam, RT_n, scale)
    np.testing.assert_allclose(lifted, pts_n, atol=1e-5)


def test_patch_crop_geometry(rng):
    img = rng.rand(120, 160, 3).astype(np.float32)
    depth = rng.rand(120, 160).astype(np.float32)
    mask = np.zeros((120, 160), bool)
    mask[40:60, 60:90] = True
    K = LINEMOD_K.copy()
    img_c, depth_c, mask_c, K_c = prep.patch_crop(
        img, depth, mask, K, margin_ratio=0.5, output_size=64
    )
    assert img_c.shape == (64, 64, 3) and depth_c.shape == (64, 64)
    assert mask_c.sum() > 0
    # mask center maps to crop center
    ys, xs = np.nonzero(mask_c)
    assert abs(xs.mean() - 32) < 3 and abs(ys.mean() - 32) < 3


def test_mask_depth_to_points_roundtrip():
    depth = np.zeros((40, 40), np.float32)
    depth[10, 20] = 2.0
    K = np.asarray([[100.0, 0, 20], [0, 100.0, 20], [0, 0, 1]], np.float32)
    pts, px = prep.mask_depth_to_points(depth, K)
    assert px.tolist() == [[20, 10]]
    np.testing.assert_allclose(pts[0], [0.0, (10 - 20) / 100 * 2, 2.0], atol=1e-6)


def test_get_correspondences(rng):
    model = rng.rand(200, 3).astype(np.float32)
    lifted = model[:50] + rng.randn(50, 3).astype(np.float32) * 1e-4
    pairs = prep.get_correspondences(lifted, model, radius=0.01, k=5)
    assert len(pairs) >= 50
    d = np.linalg.norm(lifted[pairs[:, 0]] - model[pairs[:, 1]], axis=-1)
    assert (d < 0.01 + 1e-6).all()


def test_build_correspondence_set(rng):
    cfg = prep.PreprocessConfig(num_corr=64)
    model = rng.rand(100, 3).astype(np.float32)
    lifted = model[:30]
    px = rng.randint(0, 64, (30, 2))
    pairs = np.stack([np.arange(30), np.arange(30)], axis=-1)
    mask = np.zeros((64, 64), bool)
    mask[:32] = True
    cs = prep.build_correspondence_set(
        lifted, px, model, pairs, mask, cfg, np.random.RandomState(0)
    )
    assert cs.px.shape == (64, 2)
    n_fg = int((cs.is_bg == 0).sum())
    assert n_fg == 30
    assert (cs.src_pts[cs.is_bg > 0] == 1e6).all()
    # bg pixels come from outside the mask
    bg_px = cs.px[(cs.is_bg > 0) & (cs.valid > 0)]
    assert (bg_px[:, 1] >= 32).all()


def test_too_few_correspondences_raises(rng):
    cfg = prep.PreprocessConfig(num_corr=64, min_correspondences=10)
    with pytest.raises(prep.TooFewCorrespondences):
        prep.build_correspondence_set(
            np.zeros((2, 3), np.float32), np.zeros((2, 2), np.int64),
            np.zeros((5, 3), np.float32), np.zeros((2, 2), np.int64),
            np.zeros((8, 8), bool), cfg, np.random.RandomState(0),
        )


# ------------------------------------------------------------- poses
def test_sample_noisy_poses_bounded(rng):
    from scipy.spatial.transform import Rotation

    T = np.eye(4, dtype=np.float32)[None]
    T[0, :3, :3] = Rotation.random(random_state=rng).as_matrix()
    T[0, :3, 3] = [0, 0, 0.7]
    out = poses_lib.sample_noisy_poses(T, rng)
    assert poses_lib.rotation_geodesic_deg(out[0, :3, :3], T[0, :3, :3]) <= 45.0
    assert abs(out[0, 2, 3] - 0.7) < 0.5


def test_reorthonormalize(rng):
    R = np.asarray(rng.randn(3, 3), np.float32) * 0.1 + np.eye(3, dtype=np.float32)
    Ro = poses_lib.reorthonormalize(R)
    np.testing.assert_allclose(Ro.T @ Ro, np.eye(3), atol=1e-5)
    assert np.linalg.det(Ro) > 0


# ------------------------------------------------------------- samplers
def test_given_iteration_sampler_resume():
    s1 = GivenIterationSampler(100, total_iter=10, batch_size=4)
    full = list(s1)
    s2 = GivenIterationSampler(100, total_iter=10, batch_size=4, last_iter=2)
    resumed = list(s2)
    assert full[12:] == resumed  # fast-forward (last_iter+1)*batch
    assert len(full) == 40


def test_sequential_shard_sampler_partition():
    shards = [list(SequentialShardSampler(10, k, 3)) for k in range(3)]
    merged = sorted(sum(shards, []))
    assert merged == list(range(10))


# ------------------------------------------------------------- transforms
def test_transforms_identity_at_eval(rng):
    img = rng.rand(16, 16, 3).astype(np.float32)
    t = make_transforms(is_train=False)
    np.testing.assert_array_equal(t(img), img)


def test_transforms_train_changes_but_bounded(rng):
    img = rng.rand(32, 32, 3).astype(np.float32)
    t = make_transforms(is_train=True, seed=1)
    out = t(img)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0


# ------------------------------------------------------------- config
def test_update_dict_strict():
    base = {"a": 1, "b": {"c": 2}}
    out = update_dict(base, {"b": {"c": 5}})
    assert out["b"]["c"] == 5 and base["b"]["c"] == 2
    with pytest.raises(KeyError):
        update_dict(base, {"typo_key": 1})


def test_merge_cfg_and_save(tmp_path):
    p1 = tmp_path / "a.yml"
    p1.write_text("model:\n  descriptor_dim: 16\n")
    cfg = merge_cfg([str(p1)], defaults=default_config())
    assert cfg.model.descriptor_dim == 16
    assert cfg.basic.input_h == 320  # default preserved
    out = tmp_path / "saved.yml"
    save_cfg(cfg, str(out), source=str(p1))
    assert out.exists()
    cfg2 = merge_cfg([str(out)], defaults=None)
    assert cfg2.model.descriptor_dim == 16


def test_build_typed_configs():
    cfg = default_config()
    mc = build_model_config(cfg)
    assert mc.refiner.render_iters == 3
    assert mc.refiner.gru_iters == 4
    assert mc.desc_kp.final_feats_dim == 32
    assert mc.ctx_kp.final_feats_dim == 256
    oc = build_optimizer_config(cfg)
    assert oc.lr_max == 1e-4 and oc.total_steps == 200000


# ------------------------------------------------------------- constants
def test_linemod_constants():
    assert abs(diameter_m("cat") - 0.152633) < 1e-6
    assert LINEMOD_K[0, 0] == np.float32(572.4114)
    assert len(DIAMETERS_CM) == 15
