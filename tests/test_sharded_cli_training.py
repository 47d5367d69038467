"""Composed multi-device CLI training with a GENUINELY sharded batch.

The reference's headline distributed capability is N-GPU data-parallel
training exercised end to end whenever `--world_size N` is run
(`tools/train.py:239-240` mp.spawn, `:451` DDP, `:570-571` grad
all-reduce). The TPU analog — `tools/train.py` over a `jax.sharding.Mesh`
with the batch partitioned on the 'data' axis — had every *piece* proven
(dryrun, sharded-grad equivalence, 2-process multihost) but was never
composed through the CLI with a real batch partition: at bs=1
`shard_batch` silently replicates. This test closes that gap on the
virtual 8-device CPU mesh (conftest):

  * run A: bs=8 over 8 devices — each train batch is asserted to be
    ACTUALLY partitioned (1 sample/device, not replicated) with 8 DISTINCT
    sampler-driven samples, composed with the PrefetchLoader, periodic
    SPMD eval (eval_batch=8, sharded), and checkpointing;
  * run B: the SAME bs=8 schedule forced onto a single-device mesh — the
    sharded run must match it. The comparison is on the per-step LOSS
    trajectory and a parameter-drift bound —
    NOT on a parameter-update direction: at this fixture's operating
    point (32^2 zoom crop -> 4^2 flow grid) the early-training gradient
    is pathological (|g| ~ 1e21, finite; clip handles magnitude), and
    Adam normalizes elementwise, so the f32 reduction-order drift between
    two DIFFERENT XLA executables flips the sign of almost every
    near-noise-floor component — measured cos(update_A, update_B) = 0.12
    while the loss curves agree to 5e-4. Parameter-trajectory equality
    under Adam across executables is ill-posed at this gradient scale;
    the well-posed gradient-level sharded-vs-single proof (raw f32
    gradients, cos > 0.9999) is tests/test_parallel_equivalence.py. The
    loss curve, by contrast, is insensitive to that sign-noise and IS
    sensitive to every real failure mode (wrong psum, sum-vs-mean,
    per-device data mixups, replication instead of partition);
  * run C: the sharded schedule killed at the step-2 checkpoint boundary
    (--stop_after) and `--resume`d — must be BIT-identical to run A
    (same executables, pure-function batch stream), proving kill+resume
    composes with a real mesh partition.

Batch-size-vs-device-count contract under test (parallel/mesh.py
shard_batch + the trainer's replication warning): global batch must be a
multiple of the device count for data parallelism; bs=8 on 8 devices is
the reference's bs=1-per-replica schedule.
"""
import json
import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # three composed CLI runs on the CPU mesh

import jax

cv2 = pytest.importorskip("cv2")

from rnnpose_tpu.train.checkpoint import latest_checkpoint, restore_checkpoint


def _params_at(model_dir, step=None):
    if step is None:
        path = latest_checkpoint(model_dir)
    else:
        path = os.path.join(model_dir, f"rnnpose-{step}")
    assert path is not None and os.path.exists(path), path
    state = restore_checkpoint(path)
    return state["params"]


def _flat(tree):
    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(tree)]
    )


def _losses(model_dir):
    out = {}
    with open(os.path.join(model_dir, "log.json.lst")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                out[rec["step"]] = rec["loss"]
    return out


@pytest.fixture(scope="module")
def fixture_16(tmp_path_factory):
    """16 train + 2 eval frames via the real generator: enough distinct
    frames that one bs=8 batch is fully distinct across devices."""
    from rnnpose_tpu.tools.make_synthetic_linemod import main as mksyn

    root = tmp_path_factory.mktemp("lm16")
    mksyn([
        "--out", str(root), "--frames", "16", "--eval_frames", "2",
        "--height", "96", "--width", "96",
        "--fx", "115.0", "--fy", "115.0", "--cx", "48.0", "--cy", "48.0",
        "--object_scale", "0.05", "--distance", "0.4", "--batch", "6",
    ])

    kp = {
        "num_layers": 2, "first_subsampling_dl": 0.02, "first_feats_dim": 16,
        "final_feats_dim": 32, "gnn_feats_dim": 16,
    }
    tr_kwargs = {
        "info_paths": [str(root / "cat_train.info")],
        "root_paths": [str(root)],
        "model_dir": str(root / "models"), "class_names": ["cat"],
        # via YAML (not monkeypatching) so the three CLI runs are
        # guaranteed the identical dataset configuration
        "preprocess": {
            "crop_size": 64, "num_corr": 64, "correspondence_radius": 0.05,
            "min_correspondences": 5, "max_verts": 256, "max_faces": 512,
        },
    }
    ev_kwargs = dict(
        tr_kwargs,
        info_paths=[str(root / "cat_eval.info")],
        # real eval protocol: periodic eval starts from the PoseCNN-style
        # noisy inits, not GT (without this the loader falls back to GT
        # inits and the eval measures refiner wander, not refinement)
        init_pose_paths={"POSECNN_LINEMOD": str(root / "cat_init_poses.pkl")},
    )
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
            "dataset": {"kwargs": tr_kwargs}, "batch_size": 8,
        },
        "eval_input_reader": {"dataset": {"kwargs": ev_kwargs}},
    }
    cfg_path = str(root / "cfg_bs8.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, cfg_path


def test_sharded_cli_training_composed(fixture_16, tmp_path, monkeypatch):
    root, cfg_path = fixture_16
    assert jax.device_count() == 8

    from rnnpose_tpu.parallel import mesh as mesh_lib
    from rnnpose_tpu.tools.train import main as train_main

    # ---- instrument shard_batch: record REAL placement of train batches.
    placements = []
    orig_shard = mesh_lib.shard_batch

    def recording_shard(batch, mesh, batch_size, **kw):
        img = getattr(batch, "image", None)
        pre_unique = None
        if img is not None and hasattr(img, "shape") and img.shape[0] == 8:
            pre_unique = len({np.asarray(img[i]).tobytes() for i in range(8)})
        placed = orig_shard(batch, mesh, batch_size, **kw)
        pimg = getattr(placed, "image", None)
        if pimg is not None and pre_unique is not None:
            placements.append({
                "unique_samples": pre_unique,
                "replicated": pimg.sharding.is_fully_replicated,
                "n_devices": len(pimg.sharding.device_set),
                "shard_lead": pimg.sharding.shard_shape(pimg.shape)[0],
            })
        return placed

    monkeypatch.setattr(mesh_lib, "shard_batch", recording_shard)

    common = ["--config_path", cfg_path, "--display_step", "1"]

    # ---- run A: 8-device sharded, threaded loader, periodic SPMD eval.
    dir_a = str(tmp_path / "sharded")
    train_main(common + [
        "--model_dir", dir_a, "--loader_threads", "2",
        "--eval_frames", "2", "--eval_batch", "8",
    ])

    train_placements = [p for p in placements if p["shard_lead"] in (1, 8)]
    assert len(train_placements) >= 3, "expected one placement per train step"
    for p in train_placements:
        assert not p["replicated"], (
            "bs=8 over 8 devices must be PARTITIONED, not replicated"
        )
        assert p["n_devices"] == 8 and p["shard_lead"] == 1, p
    # Distinct sampler-driven samples across the partition: each device
    # trains on different data (the reference's per-rank DataLoader shards).
    assert train_placements[0]["unique_samples"] == 8

    # periodic SPMD eval actually ran under the mesh
    with open(os.path.join(dir_a, "log.json.lst")) as f:
        recs = [json.loads(l) for l in f]
    assert any(any(k.startswith("eval/") for k in r) for r in recs)

    # ---- run B: identical schedule forced onto a SINGLE-device mesh.
    # (scoped context: a bare monkeypatch.undo() would also undo the
    # recording_shard patch above)
    placements.clear()
    one_dev_mesh = mesh_lib.make_mesh(jax.devices()[:1])
    dir_b = str(tmp_path / "single")
    with monkeypatch.context() as mp:
        mp.setattr(mesh_lib, "make_mesh", lambda *a, **k: one_dev_mesh)
        train_main(common + [
            "--model_dir", dir_b, "--loader_threads", "0",
            "--eval_frames", "0",
        ])

    # ---- equivalence: sharded trajectory == single-device trajectory.
    # Step-1: same init params, same global batch, different executables ->
    # near-exact (measured 5e-6 rel). Steps 2-3 run from slightly-diverged
    # params (Adam sign-noise, module docstring) but the loss curve must
    # stay glued (measured ~5e-4 rel); a wrong collective (sum-vs-mean is
    # 8x on the gradient) or a per-device data mixup unglues it immediately.
    la, lb = _losses(dir_a), _losses(dir_b)
    np.testing.assert_allclose(la[1], lb[1], rtol=5e-4)
    for s in (2, 3):
        np.testing.assert_allclose(la[s], lb[s], rtol=5e-3)
    # NOT asserted: the pre-clip gradient norm. At this fixture's
    # pathological gradient scale (~1e21) the norm is dominated by
    # bf16-noise-amplified components and measured 5.5x apart between the
    # two executables AT IDENTICAL params+batch — an 8x sum-vs-mean bug
    # would be indistinguishable from that noise, while the loss curve
    # above would catch it by step 2. The well-posed gradient-level
    # sharded-vs-single comparison (f32, cos > 0.9999) is
    # tests/test_parallel_equivalence.py.
    # Parameter drift after 3 steps is bounded: ~1e-3 L2 over the whole
    # 8M-param vector from benign sign-noise (RMS ~3e-7/param); a broken
    # data partition compounds visibly past this within 3 steps.
    pa3, pb3 = _params_at(dir_a, 3), _params_at(dir_b, 3)
    drift = float(np.linalg.norm(_flat(pa3) - _flat(pb3)))
    assert np.isfinite(drift) and drift < 1e-2, drift

    # ---- run C: sharded kill at the step-2 checkpoint + --resume ->
    # BIT-identical to run A.
    dir_c = str(tmp_path / "killed")
    train_main(common + [
        "--model_dir", dir_c, "--loader_threads", "0",
        "--eval_frames", "0", "--stop_after", "2",
    ])
    train_main(common + [
        "--model_dir", dir_c, "--loader_threads", "0",
        "--eval_frames", "0", "--resume",
    ])
    pc3 = _params_at(dir_c, 3)
    for x, y in zip(jax.tree.leaves(pa3), jax.tree.leaves(pc3)):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg="sharded kill+resume must be bit-identical",
        )
