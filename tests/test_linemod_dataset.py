"""LINEMOD dataset integration test with an on-disk synthetic fixture.

Builds a miniature LINEMOD-format dataset (PNG frames + OBJ model + .info
pickle), then exercises the full dataset -> preprocess -> collate path.
"""
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rnnpose_tpu.data.linemod import LinemodSynRealDataset, collate_samples
from rnnpose_tpu.data.preprocess import PreprocessConfig
from rnnpose_tpu.data.synthetic import make_icosphere
from rnnpose_tpu.models.kpconv_net import KPConvConfig
from rnnpose_tpu.models.rnnpose import RNNPoseInputs


@pytest.fixture(scope="module")
def linemod_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("lm")
    rs = np.random.RandomState(0)
    S = 96
    K = np.asarray([[120.0, 0, 48], [0, 120.0, 48], [0, 0, 1]], np.float32)

    # --- model mesh ---
    mesh = make_icosphere(2, 0.05)
    model_dir = root / "models" / "cat"
    model_dir.mkdir(parents=True)
    with open(model_dir / "textured.obj", "w") as f:
        for v, c in zip(mesh.verts, mesh.vert_colors):
            f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        for a, b, c_ in mesh.faces + 1:
            f.write(f"f {a} {b} {c_}\n")

    # --- frames ---
    frames = []
    (root / "frames").mkdir()
    from scipy.spatial.transform import Rotation

    for i in range(4):
        RT = np.eye(3, 4, dtype=np.float32)
        RT[:3, :3] = Rotation.random(random_state=rs).as_matrix()
        RT[:, 3] = [0, 0, 0.5]
        # project verts to synthesize rgb + depth
        pc = mesh.verts @ RT[:3, :3].T + RT[:, 3]
        uv = (pc[:, :2] / pc[:, 2:3]) * 120.0 + 48.0
        rgb = (rs.rand(S, S, 3) * 40).astype(np.uint8)
        depth_mm = np.zeros((S, S), np.uint16)
        pix = np.round(uv).astype(int)
        ok = (pix[:, 0] >= 0) & (pix[:, 0] < S) & (pix[:, 1] >= 0) & (pix[:, 1] < S)
        for (x, y), z, col in zip(pix[ok], pc[ok, 2], mesh.vert_colors[ok]):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < S and 0 <= xx < S:
                        rgb[yy, xx] = (col * 255).astype(np.uint8)
                        depth_mm[yy, xx] = int(z * 1000)
        cv2.imwrite(str(root / "frames" / f"{i}-color.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(root / "frames" / f"{i}-depth.png"), depth_mm)
        frames.append(
            {
                "index": i,
                "rgb_observed_path": f"frames/{i}-color.png",
                "depth_gt_observed_path": f"frames/{i}-depth.png",
                "gt_pose": RT,
                "K": K,
            }
        )
    info_path = root / "cat.info"
    with open(info_path, "wb") as f:
        pickle.dump({"cat": frames}, f)
    return root, str(info_path)


def make_dataset(root, info_path, is_train=True):
    return LinemodSynRealDataset(
        info_paths=[info_path],
        root_paths=[str(root)],
        model_dir=str(root / "models"),
        kp_cfg=KPConvConfig(num_layers=2, first_subsampling_dl=0.02),
        is_train=is_train,
        prep_cfg=PreprocessConfig(
            crop_size=64, num_corr=64, correspondence_radius=0.05,
            min_correspondences=5,
        ),
        max_verts=256,
        max_faces=512,
    )


def test_dataset_loads_and_preprocesses(linemod_fixture):
    root, info_path = linemod_fixture
    ds = make_dataset(root, info_path)
    assert len(ds) == 4
    s = ds[0]
    assert s["class_name"] == "cat"
    assert s["image"].shape == (64, 64, 3)
    assert s["image"].dtype == np.float32
    assert s["T_gt"].shape == (4, 4) and s["T_init"].shape == (4, 4)
    # train init pose is noisy but close
    from rnnpose_tpu.data.poses import rotation_geodesic_deg

    ang = rotation_geodesic_deg(s["T_init"][:3, :3], s["T_gt"][:3, :3])
    assert 0 < ang <= 45.0
    assert s["corr"] is not None
    assert s["corr"].px.shape == (64, 2)
    assert (s["corr"].valid > 0).sum() > 10


def test_dataset_eval_mode_no_corr(linemod_fixture):
    root, info_path = linemod_fixture
    ds = make_dataset(root, info_path, is_train=False)
    s = ds[1]
    assert s["corr"] is None
    # eval without init-pose pickles falls back to GT init
    np.testing.assert_allclose(s["T_init"], s["T_gt"], atol=1e-4)


def test_collate_to_inputs(linemod_fixture):
    root, info_path = linemod_fixture
    ds = make_dataset(root, info_path)
    batch = collate_samples([ds[0], ds[1]])
    assert isinstance(batch, RNNPoseInputs)
    assert batch.image.shape == (2, 64, 64, 3)
    assert batch.T_init.shape == (2, 4, 4)
    assert batch.mesh.verts.shape == (256, 3)
    assert batch.mesh.normals is not None
    assert batch.pyramid.points[0].shape[0] == 2
    assert batch.corr.px.shape == (2, 64, 2)
    assert batch.model_points.shape == (2, 256, 3)


def test_class_assets_cached(linemod_fixture):
    root, info_path = linemod_fixture
    ds = make_dataset(root, info_path)
    a1 = ds.class_assets("cat")
    a2 = ds.class_assets("cat")
    assert a1 is a2
    assert a1.scale > 0
    assert a1.mesh.face_valid.sum() > 0


def test_generate_data_info_deepim_layout(tmp_path):
    """The offline tooling scans a DeepIM-style tree into an .info pickle."""
    from rnnpose_tpu.tools.generate_data_info import main

    d = tmp_path / "data" / "train" / "cat"
    d.mkdir(parents=True)
    for i in range(2):
        cv2.imwrite(str(d / f"{i:06d}-color.png"), np.zeros((8, 8, 3), np.uint8))
        cv2.imwrite(str(d / f"{i:06d}-depth.png"), np.zeros((8, 8), np.uint16))
        np.savetxt(str(d / f"{i:06d}-pose.txt"), np.eye(3, 4))
    out = tmp_path / "cat.info"
    main(["--data_root", str(tmp_path), "--classes", "cat",
          "--split", "train", "--out", str(out)])
    with open(out, "rb") as f:
        info = pickle.load(f)
    assert len(info["cat"]) == 2
    assert info["cat"][0]["gt_pose"].shape == (3, 4)
