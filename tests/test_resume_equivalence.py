"""Composed CLI kill+resume equivalence: N steps uninterrupted must equal
k steps + checkpoint + `--resume` + (N-k) steps, bit-for-bit.

This is the trainer property the reference relies on for its 200k-step
schedules (`tools/train.py:434-436` restores net AND optimizer;
`utils/distributed_utils.py:200,260` fast-forwards the sampler) but never
asserts. Here it is exact because the batch stream is a pure function of
(seed, sampler position): `LinemodSynRealDataset.sample_at` derives one
augmentation RNG per stream position instead of sharing a stateful one
(which would make augmentation depend on call history and thread timing —
the reference's behavior, where resume is NOT bit-reproducible).

Caveat asserted implicitly: with degenerate-frame skips before the kill
point the sampler cursor and the step count drift apart (reference
semantics too); the fixture has no degenerate frames, so streams realign
exactly.
"""
import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # composed CLI runs (~ minutes on CPU)

import jax

from rnnpose_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint


def _final_params(model_dir):
    path = latest_checkpoint(model_dir)
    assert path is not None
    state = restore_checkpoint(path)
    return state["step"], state["params"]


def _assert_trees_equal(a, b, what):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=what
        )


def test_synthetic_cli_resume_bitwise(tmp_path):
    from rnnpose_tpu.tools.train import main as train_main

    cfg = {"train_config": {"steps": 4, "steps_per_eval": 2}}
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    common = [
        "--config_path", cfg_path, "--synthetic",
        "--syn_image_size", "64", "--syn_zoom", "32", "--display_step", "1",
    ]

    dir_a = str(tmp_path / "uninterrupted")
    train_main(common + ["--model_dir", dir_a, "--steps", "4"])

    dir_b = str(tmp_path / "killed")
    # 'kill' = same 4-step config stopped right after the step-2 checkpoint
    # (--stop_after keeps the LR-schedule total at 4; shortening --steps
    # would change the OneCycle shape and hence the first 2 steps).
    train_main(common + ["--model_dir", dir_b, "--steps", "4",
                         "--stop_after", "2"])
    train_main(common + ["--model_dir", dir_b, "--steps", "4", "--resume"])

    step_a, params_a = _final_params(dir_a)
    step_b, params_b = _final_params(dir_b)
    assert step_a == step_b == 4
    _assert_trees_equal(params_a, params_b, "resume must be bit-identical")


@pytest.mark.slow
def test_linemod_cli_resume_bitwise(tmp_path, monkeypatch):
    """Real-data path: sampler fast-forward + per-position augmentation RNG
    + PrefetchLoader, composed through the CLI.

    Run A is THREADED and uninterrupted; run B is SYNCHRONOUS and killed at
    the step-2 checkpoint then resumed — so one equality proves both
    properties at once: loader-thread-count invariance AND bit-exact
    resume. The fixture is a tiny rasterized dataset (the
    make_synthetic_linemod generator, not a dot-splat), so gradients are
    finite and sane; the test asserts updates were actually APPLIED
    (skipped_nonfinite == 0) — without that, a trainer that skips every
    step would pass the equality trivially (this caught the f32
    global-norm overflow fixed in train/optim.py:safe_global_norm)."""
    pytest.importorskip("cv2")
    root, info_path = _build_fixture(tmp_path)

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

    kp = {
        "num_layers": 2, "first_subsampling_dl": 0.02, "first_feats_dim": 16,
        "final_feats_dim": 32, "gnn_feats_dim": 16,
    }
    ds_kwargs = {
        "info_paths": [info_path], "root_paths": [str(root)],
        "model_dir": str(root / "models"), "class_names": ["cat"],
    }
    cfg = {
        "basic": {"zoom_crop_size": [32, 32]},
        "model": {
            "descriptor_net": {
                "keypoints_detector_3d": kp,
                "context_fea_extractor_3d": dict(kp, final_feats_dim=256),
            },
            "motion_net": {
                "iter_count": 2, "render_iter_count": 1,
                "raster": {"chunk": 64},
            },
        },
        "train_config": {"steps": 3, "steps_per_eval": 2},
        "train_input_reader": {
            "dataset": {"kwargs": ds_kwargs}, "batch_size": 1,
        },
        "eval_input_reader": {"dataset": {"kwargs": ds_kwargs}},
    }
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from rnnpose_tpu.tools.train import main as train_main

    common = ["--config_path", cfg_path, "--display_step", "1",
              "--eval_frames", "0"]

    dir_a = str(tmp_path / "uninterrupted")
    train_main(common + ["--model_dir", dir_a, "--steps", "3",
                         "--loader_threads", "2"])

    dir_b = str(tmp_path / "killed")
    train_main(common + ["--model_dir", dir_b, "--steps", "3",
                         "--loader_threads", "0", "--stop_after", "2"])
    train_main(common + ["--model_dir", dir_b, "--steps", "3",
                         "--loader_threads", "0", "--resume"])

    step_a, params_a = _final_params(dir_a)
    step_b, params_b = _final_params(dir_b)
    assert step_a == step_b == 3
    assert _skipped_steps(dir_a) == 0, (
        "updates were skipped as non-finite; the equality below would be "
        "vacuous"
    )
    _assert_trees_equal(
        params_a, params_b,
        "threaded uninterrupted run must equal sync killed+resumed run",
    )


def _skipped_steps(model_dir):
    import json
    import os

    n = 0
    with open(os.path.join(model_dir, "log.json.lst")) as f:
        for line in f:
            rec = json.loads(line)
            n += int(rec.get("skipped_nonfinite", 0))
    return n


def _build_fixture(tmp_path):
    """Tiny RASTERIZED on-disk dataset via the real generator
    (`tools/make_synthetic_linemod`): dense depth + properly shaded RGB, so
    the training gradients are the healthy kind (a hand-splatted
    dot-vertex fixture produces ~1e17 flow gradients — real but
    pathological)."""
    from rnnpose_tpu.tools.make_synthetic_linemod import main as mksyn

    root = tmp_path / "lm"
    mksyn([
        "--out", str(root), "--frames", "4", "--eval_frames", "1",
        "--height", "96", "--width", "96",
        "--fx", "115.0", "--fy", "115.0", "--cx", "48.0", "--cy", "48.0",
        "--object_scale", "0.05", "--distance", "0.4", "--batch", "5",
    ])
    return root, str(root / "cat_train.info")
