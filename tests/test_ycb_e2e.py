"""YCB/BOP path end to end (VERDICT r2 #6, BASELINE config #4): a BOP-layout
tree -> `tools/generate_data_info` (BOP branch) -> eval CLI with the
YCBEvaluator auto-selected by class name -> PoseCNN AUC metrics emitted.

The reference's own YCB surface is tables-only (`data/ycb/basic.py:2-26`,
`YCBEvaluator` commented out at `utils/eval_metric.py:361+`); this is the
working equivalent, exercised on a synthetic 024_bowl (YCB symmetric set,
so the ADD-S AUC path is the one under test).
"""
import json
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

cv2 = pytest.importorskip("cv2")
yaml = pytest.importorskip("yaml")

from rnnpose_tpu.data.synthetic import make_icosphere  # noqa: E402

CLS = "024_bowl"  # in BOP_YCB_CLASSES and YCB_SYMMETRIC


@pytest.fixture(scope="module")
def bop_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop")
    rs = np.random.RandomState(0)
    S = 96
    K = np.asarray([[120.0, 0, 48], [0, 120.0, 48], [0, 0, 1]], np.float32)

    mesh = make_icosphere(2, 0.05)
    model_dir = root / "models" / CLS
    model_dir.mkdir(parents=True)
    with open(model_dir / "textured.obj", "w") as f:
        for v, c in zip(mesh.verts, mesh.vert_colors):
            f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        for a, b, c_ in mesh.faces + 1:
            f.write(f"f {a} {b} {c_}\n")

    cls_dir = root / CLS
    (cls_dir / "rgb").mkdir(parents=True)
    (cls_dir / "depth").mkdir()
    from scipy.spatial.transform import Rotation

    scene_gt, scene_cam = {}, {}
    for i in range(4):
        RT = np.eye(3, 4, dtype=np.float32)
        RT[:3, :3] = Rotation.random(random_state=rs).as_matrix()
        RT[:, 3] = [0, 0, 0.5]
        pc = mesh.verts @ RT[:3, :3].T + RT[:, 3]
        uv = (pc[:, :2] / pc[:, 2:3]) * 120.0 + 48.0
        rgb = (rs.rand(S, S, 3) * 40).astype(np.uint8)
        depth_mm = np.zeros((S, S), np.uint16)
        pix = np.round(uv).astype(int)
        ok = (
            (pix[:, 0] >= 0) & (pix[:, 0] < S)
            & (pix[:, 1] >= 0) & (pix[:, 1] < S)
        )
        for (x, y), z, col in zip(pix[ok], pc[ok, 2], mesh.vert_colors[ok]):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < S and 0 <= xx < S:
                        rgb[yy, xx] = (col * 255).astype(np.uint8)
                        depth_mm[yy, xx] = int(z * 1000)
        cv2.imwrite(str(cls_dir / "rgb" / f"{i:06d}.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(cls_dir / "depth" / f"{i:06d}.png"), depth_mm)
        scene_gt[str(i)] = [{
            "cam_R_m2c": RT[:3, :3].reshape(-1).tolist(),
            "cam_t_m2c": (RT[:, 3] * 1000.0).tolist(),  # BOP poses are mm
            "obj_id": 13,
        }]
        scene_cam[str(i)] = {"cam_K": K.reshape(-1).tolist()}
    with open(cls_dir / "scene_gt.json", "w") as f:
        json.dump(scene_gt, f)
    with open(cls_dir / "scene_camera.json", "w") as f:
        json.dump(scene_cam, f)
    return root


def test_generate_info_bop_branch(bop_fixture, tmp_path):
    from rnnpose_tpu.tools.generate_data_info import main as gen_main

    out = str(tmp_path / "ycb.info")
    gen_main(["--data_root", str(bop_fixture), "--classes", CLS,
              "--out", out])
    with open(out, "rb") as f:
        info = pickle.load(f)
    assert CLS in info and len(info[CLS]) == 4
    fr = info[CLS][0]
    assert fr["gt_pose"].shape == (3, 4)
    # BOP mm -> m conversion
    assert abs(fr["gt_pose"][2, 3] - 0.5) < 1e-4
    assert fr["K"][0, 0] == 120.0
    assert "index" in fr


def test_ycb_eval_cli_end_to_end(bop_fixture, tmp_path):
    from rnnpose_tpu.tools.eval import main as eval_main
    from rnnpose_tpu.tools.generate_data_info import main as gen_main

    info_path = str(tmp_path / "ycb.info")
    gen_main(["--data_root", str(bop_fixture), "--classes", CLS,
              "--out", info_path])

    kp = {
        "num_layers": 2, "first_subsampling_dl": 0.02,
        "first_feats_dim": 16, "final_feats_dim": 32, "gnn_feats_dim": 16,
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
        "eval_input_reader": {
            "dataset": {
                "kwargs": {
                    "info_paths": [info_path],
                    "root_paths": [str(bop_fixture)],
                    "model_dir": str(bop_fixture / "models"),
                    "class_names": [CLS],
                    "preprocess": {
                        "crop_size": 64, "num_corr": 64,
                        "correspondence_radius": 0.05,
                        "min_correspondences": 5,
                        "max_verts": 256, "max_faces": 512,
                    },
                }
            }
        },
    }
    cfg_path = tmp_path / "ycb.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    overall = eval_main([
        "--config_path", str(cfg_path), "--max_frames", "4",
        "--evaluator", "auto",
    ])
    # The YCBEvaluator was auto-selected (BOP class name) and the PoseCNN
    # AUC metrics came out the CLI (BASELINE config #4's metric surface).
    for k in ("add_auc", "adds_auc", "adds2cm"):
        assert k in overall, f"missing YCB metric {k}"
        assert 0.0 <= float(overall[k]) <= 1.0
    assert overall["seq_len"] == 4
    assert np.isfinite(float(overall["add_dist"]))
