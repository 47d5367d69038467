"""End-to-end CLI test on the on-disk LINEMOD-format fixture: the REAL data
path through the trainer (dataset -> sampler -> collate -> SPMD step ->
checkpoint -> periodic eval) and the evaluator CLI on the result."""
import json
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # LINEMOD-format fixture end-to-end (~ minutes)
import yaml

cv2 = pytest.importorskip("cv2")

from tests.test_linemod_dataset import linemod_fixture  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def small_config(linemod_fixture, tmp_path_factory):  # noqa: F811
    root, info_path = linemod_fixture
    cfg_dir = tmp_path_factory.mktemp("cfg")
    kp = {
        "num_layers": 2,
        "first_subsampling_dl": 0.02,
        "first_feats_dim": 16,
        "final_feats_dim": 32,
        "gnn_feats_dim": 16,
    }
    cfg = {
        "basic": {"zoom_crop_size": [32, 32]},
        "model": {
            "descriptor_net": {
                "keypoints_detector_3d": kp,
                "context_fea_extractor_3d": dict(kp, final_feats_dim=256),
            },
            "motion_net": {
                "iter_count": 2,
                "render_iter_count": 1,
                "raster": {"chunk": 64},
            },
        },
        "train_config": {"steps": 2, "steps_per_eval": 2},
        "train_input_reader": {
            "dataset": {
                "kwargs": {
                    "info_paths": [info_path],
                    "root_paths": [str(root)],
                    "model_dir": str(root / "models"),
                    "class_names": ["cat"],
                }
            },
            "batch_size": 1,
        },
        "eval_input_reader": {
            "dataset": {
                "kwargs": {
                    "info_paths": [info_path],
                    "root_paths": [str(root)],
                    "model_dir": str(root / "models"),
                    "class_names": ["cat"],
                }
            }
        },
    }
    path = cfg_dir / "tiny_cat.yml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


@pytest.mark.slow
def test_train_and_eval_cli_on_linemod_fixture(small_config, tmp_path, monkeypatch):
    # The fixture dataset/preprocess defaults differ from PreprocessConfig
    # defaults (tiny 96px frames); patch the dataset construction knobs the
    # CLI doesn't expose yet through the config.
    import rnnpose_tpu.data.linemod as lm_mod
    from rnnpose_tpu.data.preprocess import PreprocessConfig

    orig_init = lm_mod.LinemodSynRealDataset.__init__

    def patched_init(self, *a, **kw):
        kw.setdefault(
            "prep_cfg",
            PreprocessConfig(
                crop_size=64, num_corr=64, correspondence_radius=0.05,
                min_correspondences=5,
            ),
        )
        kw["max_verts"] = 256
        kw["max_faces"] = 512
        orig_init(self, *a, **kw)

    monkeypatch.setattr(lm_mod.LinemodSynRealDataset, "__init__", patched_init)

    from rnnpose_tpu.tools.train import main as train_main

    model_dir = str(tmp_path / "run")
    train_main([
        "--config_path", small_config, "--model_dir", model_dir,
        "--display_step", "1", "--eval_frames", "2",
    ])
    assert os.path.exists(os.path.join(model_dir, "checkpoints.json"))
    with open(os.path.join(model_dir, "log.json.lst")) as f:
        recs = [json.loads(l) for l in f]
    assert any("loss" in r for r in recs), "train metrics logged"
    assert any(
        any(k.startswith("eval/") for k in r) for r in recs
    ), "periodic eval metrics logged"

    # eval CLI on the produced checkpoint
    from rnnpose_tpu.tools.eval import main as eval_main
    from rnnpose_tpu.train.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(model_dir)
    assert ckpt is not None
    overall = eval_main([
        "--config_path", small_config, "--ckpt_path", ckpt, "--max_frames", "2",
    ])
    assert overall["seq_len"] == 2
    assert "add01" in overall

    # batched + sharded SPMD eval on the 8-device CPU mesh: one chunk of
    # 2 real frames padded to eval_batch=8, sharded across the mesh; the
    # metrics must match the single-stream run up to reduction-order noise
    # (batching changes XLA's summation order; ADD here is ~1e-9 m).
    overall_b = eval_main([
        "--config_path", small_config, "--ckpt_path", ckpt,
        "--max_frames", "2", "--eval_batch", "8",
    ])
    assert overall_b["seq_len"] == 2
    np.testing.assert_allclose(
        overall_b["add_dist"], overall["add_dist"], atol=1e-6
    )
    for k in ("add01", "add005", "add002", "proj5", "cm5deg5"):
        assert overall_b[k] == overall[k], k

    # same checkpoint with TPU-native ICP against the fixture's depth maps
    overall_icp = eval_main([
        "--config_path", small_config, "--ckpt_path", ckpt,
        "--max_frames", "2", "--icp", "--icp_iters", "5",
        "--icp_corr_dist", "0.05", "--icp_points", "256",
    ])
    assert overall_icp["seq_len"] == 2
    assert np.isfinite(overall_icp["add_dist"])
