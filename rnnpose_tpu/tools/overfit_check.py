"""End-to-end learning validation: overfit the synthetic object and verify
the learned refinement IMPROVES poses over the noisy initialization.

This is the strongest no-assets system test: it exercises descriptors,
rendering, flow, similarity weighting, LM, all losses, the optimizer and the
eval metrics together, and demands the result that matters — ADD(refined) <
ADD(init) on frames never trained on.

Usage: python -m rnnpose_tpu.tools.overfit_check [--steps 300]
"""
from __future__ import annotations

import argparse
import dataclasses
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--train_frames", type=int, default=16)
    p.add_argument("--eval_frames", type=int, default=8)
    p.add_argument("--image_size", type=int, default=160)
    p.add_argument("--zoom", type=int, default=120)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lm_res", type=str, default="full")
    p.add_argument("--remat", choices=("default", "on", "off"),
                   default="default",
                   help="override RefinerConfig.remat for backward-memory "
                   "ablations (default: the library default)")
    # Fixture scale knobs (CI uses a reduced fixture: the full one needs
    # ~15+ s/step on the 1-core CPU box).
    p.add_argument("--num_verts", type=int, default=512)
    p.add_argument("--num_faces", type=int, default=1024)
    p.add_argument("--subdivisions", type=int, default=3)
    p.add_argument("--kp_layers", type=int, default=3)
    p.add_argument("--kp_dl", type=float, default=0.012)
    p.add_argument("--render_iters", type=int, default=3)
    p.add_argument("--gru_iters", type=int, default=4)
    p.add_argument(
        "--eval_mode", choices=("heldout", "train_newinit"),
        default="heldout",
        help="'heldout': unseen frames (viewpoint generalization; needs a "
        "large fixture + step budget to converge). 'train_newinit': the "
        "training frames with FRESH init-pose noise — a weaker but "
        "fast-converging health check (new inits mean new crops, renders "
        "and flow targets, so broken training still fails it) sized for "
        "the 1-core CPU CI box.",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.synthetic import SyntheticConfig, make_synthetic_inputs
    from ..eval import metrics as M
    from ..models.refiner import RefinerConfig
    from ..models.rnnpose import RNNPose, RNNPoseConfig

    def make(seed, with_corr=True):
        syn = SyntheticConfig(
            image_size=args.image_size, num_verts=args.num_verts,
            num_faces=args.num_faces, subdivisions=args.subdivisions,
            kp_layers=args.kp_layers, kp_dl=args.kp_dl, seed=seed,
        )
        inputs, kp_cfg = make_synthetic_inputs(syn, with_corr=with_corr)
        return jax.tree.map(jnp.asarray, inputs), kp_cfg

    t0 = time.time()
    train_set = [make(s)[0] for s in range(args.train_frames)]
    if args.eval_mode == "heldout":
        eval_set = [make(1000 + s)[0] for s in range(args.eval_frames)]
    else:
        # Same frames, fresh init-pose noise (eval path needs no corr).
        # Two independent draws per frame: the per-frame ADD of a
        # near-converged model is noisy, and CI thresholds need the mean.
        from ..data.poses import sample_noisy_poses

        rs_init = np.random.RandomState(12345)
        eval_set = [
            b._replace(
                T_init=jnp.asarray(
                    sample_noisy_poses(np.asarray(b.T_gt), rs_init)
                )
            )
            for _ in range(2)
            for b in train_set[: args.eval_frames]
        ]
    _, kp_cfg = make(0)
    print(f"data built in {time.time() - t0:.0f}s")

    cfg = RNNPoseConfig(
        desc_kp=dataclasses.replace(kp_cfg, final_feats_dim=32),
        ctx_kp=dataclasses.replace(
            kp_cfg, final_feats_dim=256, normalize_output=False
        ),
        refiner=RefinerConfig(
            zoom_crop_size=args.zoom, lm_res=args.lm_res,
            render_iters=args.render_iters, gru_iters=args.gru_iters,
            **({} if args.remat == "default"
               else {"remat": args.remat == "on"}),
        ),
    )
    model = RNNPose(cfg)
    params = jax.jit(lambda k: model.init(k, train_set[0], train=False))(
        jax.random.PRNGKey(0)
    )
    tx = optax.chain(
        optax.clip_by_global_norm(10.0), optax.adam(args.lr)
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply(p, batch, train=True)
            return out["loss"], out

        (l, out), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, l

    @jax.jit
    def fwd(params, batch):
        return model.apply(params, batch, train=False)["Ti_pred"]

    def eval_add(params):
        errs_init, errs_ref = [], []
        for b in eval_set:
            T = np.asarray(fwd(params, b))
            for name, Tp in (("init", np.asarray(b.T_init)), ("ref", T)):
                e = M.add_error(
                    jnp.asarray(Tp[:, :3, :3]), jnp.asarray(Tp[:, :3, 3]),
                    b.T_gt[:, :3, :3], b.T_gt[:, :3, 3],
                    b.model_points, b.point_valid,
                )
                (errs_init if name == "init" else errs_ref).append(
                    float(np.asarray(e).mean())
                )
        return float(np.mean(errs_init)), float(np.mean(errs_ref))

    t0 = time.time()
    losses = []
    for i in range(args.steps):
        batch = train_set[i % len(train_set)]
        params, opt_state, l = step(params, opt_state, batch)
        losses.append(float(l))
        if i % 50 == 0 or i == args.steps - 1:
            print(
                f"step {i}: loss {np.mean(losses[-50:]):.4f} "
                f"({(time.time() - t0):.0f}s)", flush=True,
            )

    init_add, ref_add = eval_add(params)
    print(f"\nheld-out ADD: init {init_add * 1000:.2f} mm -> "
          f"refined {ref_add * 1000:.2f} mm "
          f"({'IMPROVED' if ref_add < init_add else 'WORSE'})")
    print(f"loss: first50 {np.mean(losses[:50]):.4f} -> "
          f"last50 {np.mean(losses[-50:]):.4f}")
    # Machine-readable result line (parsed by tests/test_viewpoint_health.py
    # when this runs as a subprocess on the real chip).
    import json

    print("OVERFIT_CHECK_RESULT " + json.dumps({
        "init_add_mm": init_add * 1000.0,
        "ref_add_mm": ref_add * 1000.0,
        "ratio": ref_add / max(init_add, 1e-12),
        "loss_first50": float(np.mean(losses[:50])),
        "loss_last50": float(np.mean(losses[-50:])),
        "eval_mode": args.eval_mode,
        "steps": args.steps,
    }), flush=True)
    return init_add, ref_add, losses


if __name__ == "__main__":
    main()
