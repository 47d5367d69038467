"""Evaluation CLI.

Re-design of the reference `tools/eval.py:162-568`: loads a checkpoint,
iterates the eval dataset with PoseCNN/PVNet initial poses, runs the
refinement forward with cached per-class 3D descriptors, and reports
per-class ADD(-S)/Proj2D/5cm5deg via the PoseEvaluator.

Usage:
  python -m rnnpose_tpu.tools.eval --config_path cfg.yml \
      --ckpt_path runs/x/rnnpose-200000 [--synthetic]
"""
from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="rnnpose_tpu evaluator")
    p.add_argument("--config_path", type=str, default=None)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--syn_image_size", type=int, default=160)
    p.add_argument("--syn_zoom", type=int, default=120)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--dump_poses", type=str, default=None,
                   help="directory for per-class pose dumps in the "
                        "reference's layout ({cls}_pose_preds.npy, "
                        "`utils/eval_metric.py:297-300`), enabling "
                        "tool-for-tool cross-checks")
    p.add_argument("--icp", action="store_true",
                   help="TPU-native ICP refinement against the depth cloud "
                        "(the reference ships this hook dormant)")
    p.add_argument("--icp_iters", type=int, default=10)
    p.add_argument("--icp_corr_dist", type=float, default=0.02)
    p.add_argument("--icp_points", type=int, default=1024,
                   help="scene-cloud budget (padded static shape)")
    p.add_argument("--eval_batch", type=int, default=1,
                   help="frames per forward (class-homogeneous). When it is "
                        "a multiple of jax.device_count(), batches are "
                        "sharded across the device mesh — SPMD eval, the "
                        "TPU analog of the reference's DDP eval loop "
                        "(reference tools/eval.py runs bs=1 per rank).")
    p.add_argument("--evaluator", choices=("auto", "linemod", "ycb"),
                   default="auto",
                   help="metric protocol: 'linemod' = ADD(-S)@0.1/0.05/0.02d "
                        "+ Proj2D + 5cm5deg; 'ycb' adds the PoseCNN AUC "
                        "metrics (add_auc/adds_auc, BASELINE config #4) and "
                        "the YCB symmetric set; 'auto' picks ycb for "
                        "BOP-YCB class names")
    p.add_argument("--parity", action="store_true",
                   help="reference-exact operating mode: full-res LM "
                        "residuals + similarity weighting, f32 everywhere "
                        "(config.defaults.apply_parity_preset). The default "
                        "is the faster TPU serving preset (1/8-grid, bf16), "
                        "A/B'd metric-neutral on the synthetic benchmark.")
    return p.parse_args(argv)


def evaluate_frames(model, params, frames, max_frames=None):
    """Shared eval loop: frames yields (inputs, cls, diameter, model_points,
    point_valid). Returns (per-class summaries dict, overall dict).
    Used by the CLI below and by the trainer's periodic eval
    (reference `eval_once`, tools/train.py:666-757)."""
    import time

    import jax
    import numpy as np

    from ..eval.evaluator import PoseEvaluator
    from ..models.rnnpose import RNNPose
    from ..parallel.collectives import weighted_reduce_metrics

    fwd = jax.jit(
        lambda p, x, d3, c3: model.apply(
            p, x, train=False, cached_desc3d=d3, cached_ctx3d=c3
        )["Ti_pred"]
    )
    enc3d = jax.jit(lambda p, pyr: model.apply(p, pyr, method=RNNPose.encode_3d))
    cache, evaluators = {}, {}
    t_total, n_frames = 0.0, 0
    for inputs, cls, diameter, model_points, point_valid in frames:
        if max_frames is not None and n_frames >= max_frames:
            break
        if cls not in cache:
            cache[cls] = enc3d(params, inputs.pyramid)
            pts = (
                model_points[point_valid > 0]
                if point_valid is not None else model_points
            )
            evaluators[cls] = PoseEvaluator(cls, diameter, pts)
        desc3d, ctx3d = cache[cls]
        t0 = time.perf_counter()
        T_pred = fwd(params, inputs, desc3d, ctx3d)
        T_pred.block_until_ready()
        t_total += time.perf_counter() - t0
        n_frames += 1
        evaluators[cls].evaluate(
            np.asarray(T_pred), np.asarray(inputs.T_gt),
            np.asarray(inputs.intrinsics),
        )
    results = {cls: ev.summarize() for cls, ev in evaluators.items()}
    overall = weighted_reduce_metrics(list(results.values()))
    overall["fps"] = n_frames / max(t_total, 1e-9)
    return results, overall


def main(argv=None):
    args = parse_args(argv)
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config.defaults import build_model_config, default_config
    from ..eval.evaluator import PoseEvaluator
    from ..models.rnnpose import RNNPose
    from ..parallel.collectives import weighted_reduce_metrics
    from ..train import checkpoint as ckpt_lib
    from ..utils.config_io import merge_cfg
    from ..utils.progress import ProgressBar

    cfg = merge_cfg(
        [args.config_path] if args.config_path else [], defaults=default_config()
    )
    model_cfg = build_model_config(cfg)

    if args.synthetic:
        from ..data.synthetic import SyntheticConfig, make_synthetic_inputs

        small = args.syn_image_size <= 64
        syn = SyntheticConfig(
            image_size=args.syn_image_size,
            num_verts=128 if small else 512,
            num_faces=256 if small else 1024,
            subdivisions=2 if small else 3,
            kp_layers=2 if small else 3,
            kp_dl=0.02 if small else 0.012,
            fx=100.0 if small else 572.4114,
            fy=100.0 if small else 573.57043,
        )
        inputs, kp_cfg = make_synthetic_inputs(syn, with_corr=False)
        model_cfg = dataclasses.replace(
            model_cfg,
            desc_kp=dataclasses.replace(kp_cfg, final_feats_dim=32),
            ctx_kp=dataclasses.replace(
                kp_cfg, final_feats_dim=256, normalize_output=False
            ),
            refiner=dataclasses.replace(
                model_cfg.refiner,
                zoom_crop_size=args.syn_zoom,
                raster_chunk=64 if small else 128,
                render_iters=2 if small else model_cfg.refiner.render_iters,
                gru_iters=2 if small else model_cfg.refiner.gru_iters,
                corr_levels=2 if small else model_cfg.refiner.corr_levels,
            ),
        )
        frames = [(jax.tree.map(jnp.asarray, inputs), "synthetic", 0.12,
                   np.asarray(inputs.model_points[0]),
                   np.asarray(inputs.point_valid[0]), None)]
    else:
        from ..config.defaults import build_dataset
        from ..data.linemod import collate_samples
        from ..data.linemod_config import diameter_m

        dataset = build_dataset(cfg, model_cfg.desc_kp, is_train=False)

        _diam_cache = {}

        def _diameter(cls, assets):
            """LINEMOD table; else exact max pairwise extent of the model
            points (YCB/BOP classes carry no table entry — the reference
            reads per-model diameter files, `eval_metric.py:64-70`)."""
            if cls not in _diam_cache:
                try:
                    _diam_cache[cls] = diameter_m(cls)
                except KeyError:
                    pts = assets.model_points[assets.point_valid > 0]
                    d2 = ((pts[None] - pts[:, None]) ** 2).sum(-1)
                    _diam_cache[cls] = float(np.sqrt(d2.max()))
            return _diam_cache[cls]

        eval_batch = max(1, args.eval_batch)
        n_dev = jax.device_count()
        shard = eval_batch > 1 and eval_batch % n_dev == 0 and n_dev > 1
        if shard:
            from ..parallel.mesh import make_mesh, shard_batch

            mesh = make_mesh()

        def _emit(chunk):
            # Pad partial chunks by repeating the last frame (static shapes);
            # only the first len(chunk) predictions are evaluated.
            n_real = len(chunk)
            full = chunk + [chunk[-1]] * (eval_batch - n_real)
            cls = full[0]["class_name"]
            assets = dataset.class_assets(cls)
            inputs = jax.tree.map(jnp.asarray, collate_samples(full))
            if shard:
                inputs = shard_batch(inputs, mesh, eval_batch)
            return (
                inputs, cls, _diameter(cls, assets),
                assets.model_points, assets.point_valid, chunk,
            )

        def frame_gen():
            from ..data.loader import prefetch_map

            n = len(dataset)
            if args.max_frames:
                n = min(n, args.max_frames)
            buffers = {}
            # Ordered host prefetch: dataset[i] (decode + KD-tree + pyramid)
            # overlaps device compute, same frame order as the sync loop.
            samples = prefetch_map(
                range(jax.process_index(), n, jax.process_count()),
                dataset.__getitem__,
            )
            for s in samples:
                cls = s["class_name"]
                buffers.setdefault(cls, []).append(s)
                if len(buffers[cls]) == eval_batch:
                    yield _emit(buffers.pop(cls))
            for cls in list(buffers):
                yield _emit(buffers.pop(cls))

        frames = frame_gen()

    if args.parity:
        from ..config.defaults import apply_parity_preset

        model_cfg = apply_parity_preset(model_cfg)

    model = RNNPose(model_cfg)

    params = None
    fwd = None
    cache = {}
    evaluators = {}
    poses_out = {}
    t_total, n_frames = 0.0, 0
    bar = ProgressBar()
    for inputs, cls, diameter, model_points, point_valid, raw in frames:
        if params is None:
            params = jax.jit(lambda k: model.init(k, inputs, train=False))(
                jax.random.PRNGKey(0)
            )
            if args.ckpt_path:
                # Full-tree restore (orbax matches the on-disk structure,
                # which includes opt_state/step) and take the params.
                restored = ckpt_lib.restore_checkpoint(args.ckpt_path)
                params = restored["params"]
            fwd = jax.jit(
                lambda p, x, d3, c3: model.apply(
                    p, x, train=False, cached_desc3d=d3, cached_ctx3d=c3
                )["Ti_pred"]
            )
            enc3d = jax.jit(
                lambda p, pyr: model.apply(p, pyr, method=RNNPose.encode_3d)
            )
        if cls not in cache:
            cache[cls] = enc3d(params, inputs.pyramid)
            from ..data.ycb import BOP_YCB_CLASSES
            from ..eval.evaluator import YCBEvaluator

            use_ycb = args.evaluator == "ycb" or (
                args.evaluator == "auto" and cls in BOP_YCB_CLASSES
            )
            ev_cls = YCBEvaluator if use_ycb else PoseEvaluator
            evaluators[cls] = ev_cls(
                cls, diameter,
                model_points[point_valid > 0]
                if point_valid is not None else model_points,
                icp_refine=args.icp,
                icp_iters=args.icp_iters,
                icp_max_corr_dist=args.icp_corr_dist,
            )
        desc3d, ctx3d = cache[cls]
        t0 = time.perf_counter()
        T_pred = fwd(params, inputs, desc3d, ctx3d)
        T_pred.block_until_ready()
        t_total += time.perf_counter() - t0
        # `raw` is None (synthetic), one sample dict, or a list of the
        # chunk's real samples (batched/sharded path) — padded repeats at
        # the chunk tail are dropped here.
        raws = raw if isinstance(raw, list) else None
        n_real = len(raws) if raws is not None else inputs.image.shape[0]
        n_frames += n_real
        T_np = np.asarray(T_pred)[:n_real]
        T_gt_np = np.asarray(inputs.T_gt)[:n_real]
        scene_kw = {}
        if args.icp:
            if raws is None:
                raise SystemExit(
                    "--icp needs real depth frames; it cannot be combined "
                    "with --synthetic (no raw depth on synthetic inputs)."
                )
            from ..data import preprocess as prep

            m = args.icp_points
            clouds, valids = [], []
            for r in raws:
                depth = r["depth"]
                K4 = np.asarray(r["intrinsics"])
                K33 = np.asarray(
                    [[K4[0], 0, K4[2]], [0, K4[1], K4[3]], [0, 0, 1]],
                    np.float32,
                )
                pts_cam, _ = prep.mask_depth_to_points(depth, K33)
                if len(pts_cam) > m:
                    sel = np.linspace(0, len(pts_cam) - 1, m).astype(np.int64)
                    pts_cam = pts_cam[sel]
                pad = m - len(pts_cam)
                valids.append(np.concatenate(
                    [np.ones(len(pts_cam)), np.zeros(pad)]
                ).astype(np.float32))
                clouds.append(np.concatenate(
                    [pts_cam, np.zeros((pad, 3), np.float32)]
                ))
            scene_kw = dict(
                scene_points=np.stack(clouds), scene_valid=np.stack(valids)
            )
        # Proj2D must threshold in original-camera pixels (reference
        # `utils/eval_metric.py:102-110`); the crop intrinsics rescale pixel
        # units and would skew proj5. Poses are camera-frame, so the
        # pre-crop K applies directly.
        if raws is not None and all("orig_intrinsics" in r for r in raws):
            K_eval = np.stack([np.asarray(r["orig_intrinsics"]) for r in raws])
        else:
            K_eval = np.asarray(inputs.intrinsics)[:n_real]
        evaluators[cls].evaluate(T_np, T_gt_np, K_eval, **scene_kw)
        if args.dump_poses:
            poses_out.setdefault(cls, []).append(T_np)
        bar.update(n_frames)

    results = {}
    for cls, ev in evaluators.items():
        results[cls] = ev.summarize()
        print(f"\n=== {cls} ===")
        for k, v in results[cls].items():
            print(f"  {k}: {v:.4f}" if isinstance(v, float) else f"  {k}: {v}")
    overall = weighted_reduce_metrics(list(results.values()))
    overall["fps"] = n_frames / max(t_total, 1e-9)
    print("\n=== overall (seq_len weighted) ===")
    print(json.dumps({k: round(float(v), 5) for k, v in overall.items()}))
    if args.dump_poses and poses_out:
        os.makedirs(args.dump_poses, exist_ok=True)
        for cls, plist in poses_out.items():
            np.save(
                os.path.join(args.dump_poses, f"{cls}_pose_preds.npy"),
                np.concatenate(plist),
            )
    return overall


if __name__ == "__main__":
    main()
