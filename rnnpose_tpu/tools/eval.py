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
    p.add_argument("--desc_tail_res", choices=("full", "half"),
                   default=None,
                   help="override the eval 2D-descriptor tail resolution "
                        "(default: the serving preset 'half'; --parity "
                        "restores 'full'). 'half' runs decode3 + the "
                        "descriptor head at 1/2 res with the same params — "
                        "~49%% of eval FLOPs — A/B'd metric-identical on "
                        "the trained sustained-run ckpt (BENCHLOG r4 #6).")
    p.add_argument("--render_iters", type=int, default=None,
                   help="override the outer render-iteration budget "
                        "(default from config: 3). With --gru_iters this "
                        "walks the accuracy-vs-iteration-budget frontier "
                        "(tools/budget_frontier.py measures it wholesale).")
    p.add_argument("--gru_iters", type=int, default=None,
                   help="override the inner GRU/LM iteration budget "
                        "(default from config: 4)")
    p.add_argument("--parity", action="store_true",
                   help="reference-exact operating mode: full-res LM "
                        "residuals + similarity weighting, f32 everywhere "
                        "(config.defaults.apply_parity_preset). The default "
                        "is the faster TPU serving preset (1/8-grid, bf16), "
                        "A/B'd metric-neutral on the synthetic benchmark.")
    return p.parse_args(argv)


def make_frame_stream(
    dataset, eval_batch=1, max_frames=None, stride=1, mesh=None,
    collate=None,
):
    """Class-grouped, padded, optionally mesh-sharded eval frame chunks.

    The ONE frame-streaming path for both the eval CLI and the trainer's
    periodic eval (reference `eval_once`, tools/train.py:666-757): ordered
    host prefetch over the dataset, per-class chunk grouping to
    `eval_batch`, tail chunks padded by repeating the last frame (static
    shapes), and — when `eval_batch` is a multiple of the device count —
    SPMD batch sharding over `mesh`.

    Yields (inputs, cls, diameter_m, model_points, point_valid, raws) where
    `raws` is the list of the chunk's REAL sample dicts (padding excluded).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.linemod import collate_samples
    from ..data.linemod_config import diameter_m
    from ..data.loader import prefetch_map

    collate = collate or collate_samples
    eval_batch = max(1, int(eval_batch))
    n_dev = jax.device_count()
    # Multi-process: frames are process-strided, so chunks DIFFER per host
    # and cannot be device_put onto a global mesh (that contract needs the
    # same global value everywhere). Each host then batches on its local
    # devices only; weighted_reduce_metrics allgathers at the end.
    if jax.process_count() > 1:
        n_dev = jax.local_device_count()
        mesh = None
    shard = eval_batch > 1 and eval_batch % n_dev == 0 and n_dev > 1
    if shard and mesh is None:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(
            jax.local_devices() if jax.process_count() > 1 else None
        )
    if shard:
        from ..parallel.mesh import shard_batch

    _diam_cache = {}

    def _diameter(cls, assets):
        """LINEMOD table; else exact max pairwise extent of the model points
        (YCB/BOP classes carry no table entry — the reference reads
        per-model diameter files, `eval_metric.py:64-70`)."""
        if cls not in _diam_cache:
            try:
                _diam_cache[cls] = diameter_m(cls)
            except KeyError:
                pts = assets.model_points[assets.point_valid > 0]
                d2 = ((pts[None] - pts[:, None]) ** 2).sum(-1)
                _diam_cache[cls] = float(np.sqrt(d2.max()))
        return _diam_cache[cls]

    def _emit(chunk):
        n_real = len(chunk)
        full = chunk + [chunk[-1]] * (eval_batch - n_real)
        cls = full[0]["class_name"]
        assets = dataset.class_assets(cls)
        inputs = jax.tree.map(jnp.asarray, collate(full))
        if shard:
            inputs = shard_batch(inputs, mesh, eval_batch)
        return (
            inputs, cls, _diameter(cls, assets),
            assets.model_points, assets.point_valid, chunk,
        )

    def gen():
        n = len(dataset)
        if max_frames:
            n = min(n, max_frames * max(stride, 1))
        idxs = range(
            jax.process_index(), n, max(stride, 1) * jax.process_count()
        )
        buffers = {}
        # Ordered host prefetch: dataset[i] (decode + KD-tree + pyramid)
        # overlaps device compute, same frame order as the sync loop.
        for s in prefetch_map(idxs, dataset.__getitem__):
            cls = s["class_name"]
            buffers.setdefault(cls, []).append(s)
            if len(buffers[cls]) == eval_batch:
                yield _emit(buffers.pop(cls))
        for cls in list(buffers):
            yield _emit(buffers.pop(cls))

    return gen()


class EvalRunner:
    """The ONE evaluation loop, shared by the eval CLI and the trainer's
    periodic eval (VERDICT r3 #8). Holds the jitted forwards so repeated
    periodic evals reuse the compiled executables instead of re-jitting.

    Frames may be 5-tuples (inputs, cls, diameter, model_points,
    point_valid) or 6-tuples with a trailing `raws` list of the chunk's
    real sample dicts (enables padding-drop, original-K Proj2D, and ICP
    depth clouds).
    """

    def __init__(
        self, model, *, icp=False, icp_iters=10, icp_corr_dist=0.02,
        icp_points=1024, evaluator="auto",
    ):
        import jax

        from ..models.rnnpose import RNNPose

        self.model = model
        self.icp = icp
        self.icp_iters = icp_iters
        self.icp_corr_dist = icp_corr_dist
        self.icp_points = icp_points
        self.evaluator = evaluator
        self.fwd = jax.jit(
            lambda p, x, d3, c3: model.apply(
                p, x, train=False, cached_desc3d=d3, cached_ctx3d=c3
            )["Ti_pred"]
        )
        self.enc3d = jax.jit(
            lambda p, pyr: model.apply(p, pyr, method=RNNPose.encode_3d)
        )

    def _make_evaluator(self, cls, diameter, model_points, point_valid):
        from ..data.ycb import BOP_YCB_CLASSES
        from ..eval.evaluator import PoseEvaluator, YCBEvaluator

        use_ycb = self.evaluator == "ycb" or (
            self.evaluator == "auto" and cls in BOP_YCB_CLASSES
        )
        ev_cls = YCBEvaluator if use_ycb else PoseEvaluator
        pts = (
            model_points[point_valid > 0]
            if point_valid is not None else model_points
        )
        return ev_cls(
            cls, diameter, pts,
            icp_refine=self.icp,
            icp_iters=self.icp_iters,
            icp_max_corr_dist=self.icp_corr_dist,
        )

    def _scene_clouds(self, raws):
        import numpy as np

        from ..data import preprocess as prep

        m = self.icp_points
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
        return dict(
            scene_points=np.stack(clouds), scene_valid=np.stack(valids)
        )

    def run(
        self, params, frames, max_frames=None, progress=None,
        collect_poses=False,
    ):
        """Returns (per-class summaries, seq_len-weighted overall,
        {cls: poses} if collect_poses else None)."""
        import time

        import jax
        import numpy as np

        from ..parallel.collectives import weighted_reduce_metrics

        if jax.process_count() > 1:
            # Multihost eval is process-LOCAL compute + a final allgather:
            # frames differ per host (process-strided), so inputs cannot
            # form global-mesh arrays — but trainer params arrive committed
            # to the GLOBAL mesh, and jax.jit rejects arguments committed
            # to different device sets. Re-place a replicated copy of the
            # params on this host's local devices once per run; params are
            # fully replicated, so device_get is process-local and cheap.
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            local_mesh = Mesh(np.asarray(jax.local_devices()), ("data",))
            params = jax.device_put(
                jax.device_get(params),
                NamedSharding(local_mesh, PartitionSpec()),
            )

        cache, evaluators, poses_out = {}, {}, {}
        t_total, n_frames = 0.0, 0
        for item in frames:
            if max_frames is not None and n_frames >= max_frames:
                break
            if len(item) == 5:
                inputs, cls, diameter, model_points, point_valid = item
                raw = None
            else:
                inputs, cls, diameter, model_points, point_valid, raw = item
            if cls not in cache:
                cache[cls] = self.enc3d(params, inputs.pyramid)
                evaluators[cls] = self._make_evaluator(
                    cls, diameter, model_points, point_valid
                )
            desc3d, ctx3d = cache[cls]
            t0 = time.perf_counter()
            T_pred = self.fwd(params, inputs, desc3d, ctx3d)
            T_pred.block_until_ready()
            t_total += time.perf_counter() - t0
            raws = raw if isinstance(raw, list) else (
                [raw] if isinstance(raw, dict) else None
            )
            n_real = len(raws) if raws is not None else inputs.image.shape[0]
            n_frames += n_real
            T_np = np.asarray(T_pred)[:n_real]
            T_gt_np = np.asarray(inputs.T_gt)[:n_real]
            scene_kw = {}
            if self.icp:
                if raws is None:
                    raise SystemExit(
                        "--icp needs real depth frames; it cannot be "
                        "combined with --synthetic (no raw depth on "
                        "synthetic inputs)."
                    )
                scene_kw = self._scene_clouds(raws)
            # Proj2D must threshold in original-camera pixels (reference
            # `utils/eval_metric.py:102-110`); the crop intrinsics rescale
            # pixel units and would skew proj5. Poses are camera-frame, so
            # the pre-crop K applies directly.
            if raws is not None and all("orig_intrinsics" in r for r in raws):
                K_eval = np.stack(
                    [np.asarray(r["orig_intrinsics"]) for r in raws]
                )
            else:
                K_eval = np.asarray(inputs.intrinsics)[:n_real]
            evaluators[cls].evaluate(T_np, T_gt_np, K_eval, **scene_kw)
            if collect_poses:
                poses_out.setdefault(cls, []).append(T_np)
            if progress is not None:
                progress.update(n_frames)
        results = {cls: ev.summarize() for cls, ev in evaluators.items()}
        overall = weighted_reduce_metrics(list(results.values()))
        overall["fps"] = n_frames / max(t_total, 1e-9)
        poses = (
            {c: np.concatenate(p) for c, p in poses_out.items()}
            if collect_poses else None
        )
        return results, overall, poses


def evaluate_frames(model, params, frames, max_frames=None):
    """Back-compat wrapper: one-shot EvalRunner over 5/6-tuple frames.
    Returns (per-class summaries dict, overall dict)."""
    results, overall, _ = EvalRunner(model).run(
        params, frames, max_frames=max_frames
    )
    return results, overall


def main(argv=None):
    args = parse_args(argv)
    import dataclasses
    import itertools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config.defaults import build_model_config, default_config
    from ..models.rnnpose import RNNPose
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

        dataset = build_dataset(cfg, model_cfg.desc_kp, is_train=False)
        frames = make_frame_stream(
            dataset, eval_batch=args.eval_batch, max_frames=args.max_frames
        )

    if args.parity:
        from ..config.defaults import apply_parity_preset

        model_cfg = apply_parity_preset(model_cfg)
    if args.desc_tail_res is not None:
        model_cfg = dataclasses.replace(
            model_cfg, desc2d_eval_tail_res=args.desc_tail_res
        )
    if args.render_iters is not None or args.gru_iters is not None:
        ref = model_cfg.refiner
        model_cfg = dataclasses.replace(
            model_cfg,
            refiner=dataclasses.replace(
                ref,
                render_iters=args.render_iters or ref.render_iters,
                gru_iters=args.gru_iters or ref.gru_iters,
            ),
        )

    model = RNNPose(model_cfg)
    # Self-describing operating mode: non-parity runs use the serving
    # presets (half-res descriptor tail, bf16, 1/8-grid LM), so every eval
    # states what it ran before printing metrics.
    print(
        "eval operating mode: "
        f"desc_tail_res={model_cfg.desc2d_eval_tail_res} "
        f"parity={'on' if args.parity else 'off'} "
        f"render_iters={model_cfg.refiner.render_iters} "
        f"gru_iters={model_cfg.refiner.gru_iters}"
    )

    frames = iter(frames)
    first = next(frames, None)
    if first is None:
        raise SystemExit("eval dataset is empty")
    params = jax.jit(lambda k: model.init(k, first[0], train=False))(
        jax.random.PRNGKey(0)
    )
    if args.ckpt_path:
        # Full-tree restore (orbax matches the on-disk structure, which
        # includes opt_state/step) and take the params.
        params = ckpt_lib.restore_checkpoint(args.ckpt_path)["params"]

    runner = EvalRunner(
        model, icp=args.icp, icp_iters=args.icp_iters,
        icp_corr_dist=args.icp_corr_dist, icp_points=args.icp_points,
        evaluator=args.evaluator,
    )
    results, overall, poses_out = runner.run(
        params, itertools.chain([first], frames),
        progress=ProgressBar(), collect_poses=bool(args.dump_poses),
    )

    for cls, summary in results.items():
        print(f"\n=== {cls} ===")
        for k, v in summary.items():
            print(f"  {k}: {v:.4f}" if isinstance(v, float) else f"  {k}: {v}")
    print("\n=== overall (seq_len weighted) ===")
    print(json.dumps({k: round(float(v), 5) for k, v in overall.items()}))
    if args.dump_poses and poses_out:
        os.makedirs(args.dump_poses, exist_ok=True)
        for cls, parr in poses_out.items():
            np.save(
                os.path.join(args.dump_poses, f"{cls}_pose_preds.npy"), parr
            )
    return overall


if __name__ == "__main__":
    main()
