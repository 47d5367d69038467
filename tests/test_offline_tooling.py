"""Fixture-based tests for the offline data tooling (VERDICT r1 item 7).

Each test synthesizes the source directory layout the real DeepIM /
PVNet-rendering assets use, runs the generator, and checks the emitted
`.info` / frame files are consumable."""
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rnnpose_tpu.tools.deepim_info import (  # noqa: E402
    create_orig_info,
    create_posecnnval_info,
    create_syn_info,
    create_v2_info,
)
from rnnpose_tpu.tools.transform_pvnet_data import (  # noqa: E402
    bbox_crop,
    process_fuse,
    process_syn,
    range_to_depth,
)


def _write_pose(path, RT):
    with open(path, "w") as f:
        f.write("pose\n")
        for row in RT:
            f.write(" ".join(str(v) for v in row) + "\n")


def _png(path, shape=(48, 64)):
    img = np.random.randint(0, 255, shape + (3,), np.uint8)
    cv2.imwrite(path, img)


def _make_deepim_tree(root, cls="cat", cls_idx=6, ids=(3, 7),
                      num_rendered=2, syn=False, posecnnval=False):
    obs_name = cls if syn else f"{cls_idx:02d}"
    obs = os.path.join(root, "data", "observed", obs_name)
    gt = os.path.join(root, "data", "gt_observed", cls)
    if posecnnval:
        ren = os.path.join(root, "data", "rendered", f"{cls_idx:02d}", cls)
    else:
        ren = os.path.join(root, "data", "rendered", cls)
    split_dir = os.path.join(root, "image_set", "observed")
    for d in (obs, gt, ren, split_dir):
        os.makedirs(d, exist_ok=True)

    poses = {}
    for idx in ids:
        RT = np.eye(4)[:3].astype(np.float32)
        RT[2, 3] = 0.5 + idx * 0.01
        poses[idx] = RT
        _png(os.path.join(obs, f"{idx:06d}-color.png"))
        _png(os.path.join(obs, f"{idx:06d}-depth.png"))
        _write_pose(os.path.join(gt, f"{idx:06d}-pose.txt"), RT)
        _png(os.path.join(gt, f"{idx:06d}-depth.png"))
        for i in range(num_rendered):
            stem = (f"{cls}_{idx:06d}_{i}" if (syn or posecnnval)
                    else f"{idx:06d}_{i}")
            _png(os.path.join(ren, f"{stem}-color.png"))
            _png(os.path.join(ren, f"{stem}-depth.png"))
            noisy = RT.copy()
            noisy[0, 3] += 0.01 * (i + 1)
            _write_pose(os.path.join(ren, f"{stem}-pose.txt"), noisy)

    if syn:
        split_name = f"LM6d_data_syn_train_observed_{cls}.txt"
    elif posecnnval:
        split_name = f"{cls}_test.txt"
    else:
        split_name = f"{cls}_train.txt"
    with open(os.path.join(split_dir, split_name), "w") as f:
        for idx in ids:
            f.write(f"{obs_name}/{idx:06d}\n")
    return poses


def test_orig_info(tmp_path):
    root = str(tmp_path)
    poses = _make_deepim_tree(root, num_rendered=2)
    info = create_orig_info(root, classes=["cat"], num_rendered=2)
    frames = info["cat"]
    assert len(frames) == 4  # 2 frames x 2 renders
    fr = frames[0]
    assert fr["index"] == 3
    np.testing.assert_allclose(fr["gt_pose"], poses[3])
    # noisy render poses differ per render slot
    assert frames[0]["pose_noisy_rendered"][0, 3] != (
        frames[1]["pose_noisy_rendered"][0, 3])
    for key in ("rgb_observed_path", "depth_gt_observed_path",
                "rgb_noisy_rendered"):
        assert os.path.exists(os.path.join(root, frames[0][key])), key


def test_syn_info(tmp_path):
    root = str(tmp_path)
    _make_deepim_tree(root, syn=True, num_rendered=1)
    info = create_syn_info(root, classes=["cat"])
    frames = info["cat"]
    assert len(frames) == 2
    assert all(f["is_syn"] for f in frames)
    assert os.path.exists(os.path.join(root, frames[0]["rgb_noisy_rendered"]))


def test_posecnnval_info(tmp_path):
    root = str(tmp_path)
    _make_deepim_tree(root, posecnnval=True, num_rendered=1)
    info = create_posecnnval_info(root, classes=["cat"])
    frames = info["cat"]
    assert len(frames) == 2
    assert frames[0]["index"] == 3  # explicit per-frame index for init poses
    assert os.path.exists(os.path.join(root, frames[0]["rgb_noisy_rendered"]))


def test_missing_files_raise(tmp_path):
    root = str(tmp_path)
    _make_deepim_tree(root, num_rendered=1)
    os.remove(os.path.join(root, "data", "observed", "06", "000003-color.png"))
    with pytest.raises(FileNotFoundError):
        create_orig_info(root, classes=["cat"], num_rendered=1)


# ---------------------------------------------------------------------------
# range <-> depth and the PVNet transform pipeline
# ---------------------------------------------------------------------------

def test_range_to_depth_analytic():
    K = np.array([[700.0, 0, 32], [0, 700.0, 24], [0, 0, 1]], np.float32)
    H, W = 48, 64
    z = np.full((H, W), 0.7, np.float32)
    # Build the range image from the known z-depth, then invert.
    ys, xs = np.mgrid[:H, :W]
    x, y = xs + 0.5, ys + 0.5
    ray = np.sqrt(K[0, 0] ** 2 + (K[0, 2] - x) ** 2 + (K[1, 2] - y) ** 2)
    rng = z * ray / K[0, 0]
    mask = np.ones((H, W), bool)
    out = range_to_depth(mask, rng, K)
    np.testing.assert_allclose(out, z, rtol=1e-5)


def test_bbox_crop_updates_intrinsics():
    img = np.zeros((60, 80, 3), np.uint8)
    depth = np.ones((60, 80), np.float32)
    mask = np.zeros((60, 80), bool)
    mask[20:40, 30:50] = True
    depth[mask] = 0.5
    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]], np.float32)
    patch, dpatch, K_new = bbox_crop(img, depth, mask, K, 0.1, 32)
    assert patch.shape == (32, 32, 3) and dpatch.shape == (32, 32)
    # A 3D point projecting to the mask center must land at the crop center.
    u_old = np.array([40.0, 30.0])  # pixel (center of mask ~ (40, 30))
    s = K_new[0, 0] / K[0, 0]
    u_new = (u_old - [K[0, 2], K[1, 2]]) * s + [K_new[0, 2], K_new[1, 2]]
    assert 0 <= u_new[0] <= 32 and 0 <= u_new[1] <= 32


def _make_pvnet_syn(root, cls="cat", n=3):
    from rnnpose_tpu.data.linemod_config import BLENDER_K

    os.makedirs(os.path.join(root, cls), exist_ok=True)
    info = {cls: []}
    K = BLENDER_K  # process_syn decodes non-lmk renders with blender K
    for i in range(n):
        img_rel = os.path.join(cls, f"{i}.jpg")
        dep_rel = os.path.join(cls, f"{i}_depth.npy")
        _png(os.path.join(root, img_rel), (48, 64))
        rng = np.ones((48, 64), np.float32)
        ys, xs = np.mgrid[20:35, 25:45]
        ray = np.sqrt(
            K[0, 0] ** 2 + (K[0, 2] - xs - 0.5) ** 2
            + (K[1, 2] - ys - 0.5) ** 2)
        rng[20:35, 25:45] = (0.6 * ray / K[0, 0]) / 2.0  # range*0.5 encoding
        np.save(os.path.join(root, dep_rel), rng)
        RT = np.eye(4)[:3].astype(np.float32)
        RT[2, 3] = 0.6 + 0.01 * i
        info[cls].append({"index": i, "image_path": img_rel,
                          "depth_path": dep_rel, "RT": RT})
    return info


def test_transform_syn_then_v2(tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    info = _make_pvnet_syn(src, n=3)

    n = process_syn(info, src, out,
                    crop_param={"margin_ratio": 0.1, "output_size": 32})
    assert n == 3
    # The emitted depth recovers the analytic plane depth (0.6 m).
    d = np.load(os.path.join(out, "cat", "00000_depth.npy"))
    vals = d[(d > 0) & (d < 1)]
    np.testing.assert_allclose(vals, 0.6, atol=1e-3)

    # Feed the produced layout into the v2 info generator.
    train, ev = create_v2_info(out, classes=["cat"], ratio=2.0 / 3.0,
                               shuffle=False)
    assert len(train["cat"]) == 2 and len(ev["cat"]) == 1
    fr = train["cat"][0]
    assert fr["K"].shape == (3, 3) and fr["gt_pose"].shape == (3, 4)
    assert os.path.exists(os.path.join(out, fr["rgb_observed_path"]))
    assert os.path.exists(os.path.join(out, fr["depth_gt_observed_path"]))


def test_process_fuse_single(tmp_path):
    src = str(tmp_path / "fuse")
    dep = str(tmp_path / "renders")
    out = str(tmp_path / "out")
    cls = "cat"
    os.makedirs(os.path.join(src, cls))
    os.makedirs(os.path.join(dep, cls))

    K = np.array([[572.4114, 0, 325.2611],
                  [0, 573.57043, 242.04899], [0, 0, 1]], np.float32)
    H, W = 480, 640
    # Source render: object blob in range encoding.
    rng = np.ones((H, W), np.float32)
    ys, xs = np.mgrid[100:140, 200:260]
    ray = np.sqrt(K[0, 0] ** 2 + (K[0, 2] - xs - 0.5) ** 2
                  + (K[1, 2] - ys - 0.5) ** 2)
    rng[100:140, 200:260] = (0.8 * ray / K[0, 0]) / 2.0
    np.save(os.path.join(dep, cls, "5_depth.png.npy"), rng)

    stem = os.path.join(src, cls, "0")
    _png(stem + "_rgb.jpg", (H, W))
    m = np.zeros((H, W, 3), np.uint8)
    m[110:130, 210:250, 0] = 1  # fuse ids start at 1
    cv2.imwrite(stem + "_mask.png", m)
    RT = np.eye(4)[:3].astype(np.float32)
    fuse_info = ([(10, 20)], [RT], [{"img_idx": 5}])
    with open(stem + "_info.pkl", "wb") as f:
        pickle.dump(fuse_info, f)

    info = {cls: [{"index": 0, "image_path": os.path.join(cls, "0.jpg"),
                   "depth_path": ""}]}
    n = process_fuse(info, src, dep, out, crop_param=None, single=True)
    assert n == 1
    d = np.load(os.path.join(out, cls, "00000_depth.npy"))
    # Depth pasted at the (10, 20) offset, still ~0.8 m after range->depth
    # (the offset also shifts the principal point, keeping rays consistent).
    vals = d[(d > 0) & (d < 1)]
    assert len(vals) > 0
    np.testing.assert_allclose(vals, 0.8, atol=2e-2)
    with open(os.path.join(out, cls, "00000_params.pkl"), "rb") as f:
        params = pickle.load(f)
    assert params["K"][0, 2] == pytest.approx(K[0, 2] + 20)
    assert params["K"][1, 2] == pytest.approx(K[1, 2] + 10)
