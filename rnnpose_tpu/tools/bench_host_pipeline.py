"""Host input-pipeline throughput at shipping sizes (VERDICT r2 #4).

The trainer overlaps host preprocessing with device compute through
`data/loader.PrefetchLoader`; this tool measures whether the host side can
actually keep up: it synthesizes a LINEMOD-layout fixture at the shipping
operating point (640x480 PNG frames like real LINEMOD, 2048-vert model,
4-layer KPConv pyramid, 320x320 crops, full correspondence build), then
measures

  * per-sample `dataset[i]` latency (decode + VOC-less preprocess +
    KD-tree correspondences) single-threaded,
  * `PrefetchLoader` samples/s at 1/2/4/8 worker threads,

and reports the margin against the device train-step budget
(`--device_ms`, default 49 ms/step at bs=1 — BENCHLOG round-2).

Usage: python -m rnnpose_tpu.tools.bench_host_pipeline [--frames 24]
       [--device_ms 49] [--batch_size 1]
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def make_shipping_fixture(root: str, num_frames: int = 24, seed: int = 0):
    """LINEMOD-layout tree at shipping sizes: 640x480 frames, dense object
    renders (~real fg pixel counts drive the KD-tree cost), 2048v model."""
    import cv2
    import numpy as np
    import pickle

    import jax
    import jax.numpy as jnp

    from ..data.synthetic import make_icosphere
    from ..render import mesh as mesh_lib
    from ..render.raster import rasterize_with_vis_attrs

    rs = np.random.RandomState(seed)
    H, W = 480, 640
    K = np.asarray(
        [[572.4114, 0, 325.2611], [0, 573.57043, 242.04899], [0, 0, 1]],
        np.float32,
    )

    mesh = make_icosphere(4, 0.06)  # 2562 verts
    mesh = mesh_lib.simplify_mesh(mesh, 2048, 4096)
    mesh = mesh_lib.orient_faces_outward(mesh)

    model_dir = os.path.join(root, "models", "cat")
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "textured.obj"), "w") as f:
        for v, c in zip(mesh.verts, mesh.vert_colors):
            f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        for a, b, c_ in mesh.faces + 1:
            f.write(f"f {a} {b} {c_}\n")
    # Padded copy for the raster kernels (F must be a chunk multiple).
    mesh = mesh_lib.pad_mesh(mesh, 2048, 4096)
    face_valid = np.arange(4096) < mesh.num_faces

    frames_dir = os.path.join(root, "frames")
    os.makedirs(frames_dir, exist_ok=True)

    from scipy.spatial.transform import Rotation

    raster = jax.jit(
        lambda vc, kv, attrs: rasterize_with_vis_attrs(
            vc, jnp.asarray(mesh.faces), kv, attrs, H, W,
            face_valid=jnp.asarray(face_valid),
        ),
        backend="cpu",
    )
    frames = []
    for i in range(num_frames):
        RT = np.eye(3, 4, dtype=np.float32)
        RT[:3, :3] = Rotation.random(random_state=rs).as_matrix()
        RT[:, 3] = [rs.uniform(-0.05, 0.05), rs.uniform(-0.05, 0.05),
                    rs.uniform(0.45, 0.65)]
        vc = mesh.verts @ RT[:3, :3].T + RT[:, 3]
        attrs = np.concatenate(
            [mesh.vert_colors, vc[:, 2:3]], axis=-1
        ).astype(np.float32)
        kvec = np.asarray([[K[0, 0], K[1, 1], K[0, 2], K[1, 2]]], np.float32)
        amap, _, fid = raster(
            jnp.asarray(vc[None]), jnp.asarray(kvec), jnp.asarray(attrs[None])
        )
        amap, fid = np.asarray(amap)[0], np.asarray(fid)[0]
        fg = fid >= 0
        rgb = (rs.rand(H, W, 3) * 40).astype(np.uint8)
        rgb[fg] = np.clip(amap[fg, :3] * 255, 0, 255).astype(np.uint8)
        depth_mm = np.zeros((H, W), np.uint16)
        depth_mm[fg] = (amap[fg, 3] * 1000).astype(np.uint16)
        cv2.imwrite(os.path.join(frames_dir, f"{i}-color.png"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(frames_dir, f"{i}-depth.png"), depth_mm)
        frames.append({
            "index": i,
            "rgb_observed_path": f"frames/{i}-color.png",
            "depth_gt_observed_path": f"frames/{i}-depth.png",
            "gt_pose": RT,
            "K": K,
        })
    info_path = os.path.join(root, "cat.info")
    with open(info_path, "wb") as f:
        pickle.dump({"cat": frames}, f)
    return info_path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--samples", type=int, default=96,
                   help="total samples to time (cycles over --frames)")
    p.add_argument("--device_ms", type=float, default=49.0)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--threads", type=int, nargs="*", default=[1, 2, 4, 8])
    args = p.parse_args(argv)

    import numpy as np

    from ..data.linemod import LinemodSynRealDataset, collate_samples
    from ..data.loader import PrefetchLoader
    from ..data.preprocess import TooFewCorrespondences
    from ..models.kpconv_net import KPConvConfig

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        info_path = make_shipping_fixture(root, args.frames)
        print(f"fixture built in {time.perf_counter() - t0:.1f}s "
              f"({args.frames} frames, 640x480, 2048v model)")

        ds = LinemodSynRealDataset(
            info_paths=[info_path],
            root_paths=[root],
            model_dir=os.path.join(root, "models"),
            kp_cfg=KPConvConfig(num_layers=4, first_subsampling_dl=0.025),
            is_train=True,
        )
        ds.class_assets("cat")  # pay the one-time pyramid outside the timing
        ds[0]

        # -- single-thread per-sample latency --
        n = args.samples
        t0 = time.perf_counter()
        for i in range(n):
            try:
                ds[i % len(ds)]
            except TooFewCorrespondences:
                pass
        t_sample = (time.perf_counter() - t0) / n * 1000
        print(f"dataset[i] single-thread: {t_sample:.1f} ms/sample "
              f"({1000 / t_sample:.1f} samples/s)")

        # -- prefetch loader throughput --
        bs = args.batch_size
        need = 1000.0 / args.device_ms * bs  # samples/s to saturate the chip
        results = {}
        for nt in args.threads:
            idxs = [i % len(ds) for i in range(n)]
            loader = PrefetchLoader(
                idxs, ds.__getitem__, bs,
                lambda s: collate_samples(s),
                num_threads=nt, skip_exc=TooFewCorrespondences,
            )
            it = iter(loader)
            next(it)  # warm the pipeline
            t0 = time.perf_counter()
            got = sum(1 for _ in it)
            dt = time.perf_counter() - t0
            loader.close()
            sps = got * bs / dt
            results[nt] = sps
            print(f"PrefetchLoader x{nt} threads: {sps:.1f} samples/s "
                  f"(need {need:.1f} for the {args.device_ms:.0f} ms/step "
                  f"device budget at bs={bs}; margin {sps / need:.2f}x)")

        best = max(results.values())
        print(json.dumps({
            "metric": "host_pipeline_samples_per_sec",
            "value": round(best, 2),
            "single_thread_ms": round(t_sample, 2),
            "per_threads": {str(k): round(v, 2) for k, v in results.items()},
            "device_budget_samples_per_sec": round(need, 2),
            "margin": round(best / need, 2),
        }))


if __name__ == "__main__":
    main()
