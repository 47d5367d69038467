"""Component-level TPU timing: where does a refinement step spend its time?

Usage: python -m rnnpose_tpu.tools.profile_components [--trace DIR]
Times (after compile): rasterizer, splat, image encoder, corr build, one GRU
step, one LM step, full eval forward, full train step.
"""
from __future__ import annotations

import argparse
import dataclasses
import time


def timeit(fn, *args, iters=10, name="", vary=0):
    """Time a jitted fn with the full anti-relay protocol (BENCHLOG.md):

    * every iteration perturbs the float leaves of `args[vary]` by a
      fresh epsilon IN-GRAPH — identical repeated executions are
      deduplicated by the sandbox's TPU relay (its cache persists across
      processes), which silently corrupts measurements;
    * iterations are chained (1e-30 × previous output scalar folds into
      the perturbation) so the relay cannot overlap them across its
      backend pool — this measures true serialized per-call latency;
    * the timing window closes on a HOST VALUE READ of the final output:
      through the relay `block_until_ready()` can return before execution
      completes (measured 0.16 ms for a 227-GFLOP forward);
    * one jitted dispatch per iteration — eager per-op perturbation would
      add tens of ms of relay round-trips to every sample.
    Entropy-seed the base epsilon so re-runs don't replay cached inputs.

    The chained scalar reduces over EVERY float leaf of fn's output (means,
    not first-leaf slices) so no output — optimizer-state updates, secondary
    feature maps — is dead code XLA could prune from the timed program. The
    per-iteration perturbation + reduction adds a small constant overhead vs
    a bare fn call (noted in BENCHLOG.md).
    """
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    def _float_leaves(o):
        return [
            jnp.asarray(x)
            for x in jax.tree_util.tree_leaves(o)
            if hasattr(x, "dtype") and jnp.issubdtype(
                jnp.asarray(x).dtype, jnp.floating
            )
        ]

    def _reduce(o):
        """(scalar keeping all float leaves live, all-finite flag)."""
        leaves = _float_leaves(o)
        assert leaves, f"{name}: fn output has no float leaves to reduce"
        s = sum(jnp.mean(x.astype(jnp.float32)) for x in leaves)
        finite = jnp.asarray(True)
        for x in leaves:
            finite = jnp.logical_and(finite, jnp.isfinite(x).all())
        return s, finite

    # Guard the perturbation contract: at least one leaf of args[vary] must
    # actually be perturbable, else the relay's execution dedup can replay
    # cached results and corrupt the measurement.
    n_pert = sum(
        1 for x in jax.tree_util.tree_leaves(args[vary])
        if hasattr(x, "dtype") and x.dtype in (jnp.float32, jnp.bfloat16)
    )
    assert n_pert > 0, (
        f"{name}: no float32/bf16 leaves in args[{vary}] to perturb "
        "(relay-dedup risk); pass a different `vary` index"
    )

    def step_fn(chain, eps0, *a):
        a = list(a)
        eps = eps0 + 1e-30 * chain
        a[vary] = jax.tree.map(
            lambda x: x + eps.astype(x.dtype)
            if hasattr(x, "dtype") and x.dtype in (jnp.float32, jnp.bfloat16)
            else x,
            a[vary],
        )
        return _reduce(fn(*a))

    step = jax.jit(step_fn)
    rs = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    eps_seq = [jnp.float32(rs.uniform(0.5, 1.5) * 1e-7) for _ in range(iters)]

    chain = jnp.float32(0.0)
    c0, _ = step(chain, jnp.float32(1e-7), *args)
    float(c0)  # compile + host-read sync
    finite = None
    t0 = time.perf_counter()
    for i in range(iters):
        chain, finite = step(chain, eps_seq[i], *args)
    final = float(np.asarray(chain))  # host reads INSIDE the window
    all_finite = bool(np.asarray(finite))
    dt = (time.perf_counter() - t0) / iters * 1000
    assert all_finite and np.isfinite(final), f"{name}: non-finite output"
    print(f"{name:34s} {dt:8.3f} ms")
    return dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the refiner's inner-scan body "
                   "(RefinerConfig.remat): the speed-vs-HBM ablation knob "
                   "for the train step")
    p.add_argument("--train_cost", action="store_true",
                   help="print the compiled train step's XLA cost+memory "
                   "analysis (FLOPs, HBM args/temp/peak) before timing")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.synthetic import SyntheticConfig, make_synthetic_inputs
    from ..geometry import lm as lm_lib
    from ..models.cfnet import ImageFeaEncoder
    from ..models.refiner import RefinerConfig
    from ..models.rnnpose import RNNPose, RNNPoseConfig
    from ..ops import corr as corr_ops
    from ..render.raster import rasterize
    from ..render.splat import splat_depth
    from ..train.loop import make_train_step
    from ..train.optim import OptimizerConfig, build_optimizer

    syn = SyntheticConfig(
        image_size=320, num_verts=2048, num_faces=4096, subdivisions=4,
        kp_layers=4, kp_dl=0.006, batch_size=args.batch,
    )
    inputs, kp_cfg = make_synthetic_inputs(syn)
    cfg = RNNPoseConfig(
        desc_kp=dataclasses.replace(kp_cfg, final_feats_dim=32, first_feats_dim=128, gnn_feats_dim=128),
        ctx_kp=dataclasses.replace(kp_cfg, final_feats_dim=256, first_feats_dim=128, gnn_feats_dim=128, normalize_output=False),
        refiner=RefinerConfig(remat=args.remat),
    )
    inputs = jax.tree.map(jnp.asarray, inputs)
    model = RNNPose(cfg)
    params = jax.jit(lambda k: model.init(k, inputs, train=False))(
        jax.random.PRNGKey(0)
    )

    S = cfg.refiner.zoom_crop_size
    mesh = inputs.mesh
    K_crop = inputs.intrinsics

    # --- components ---
    verts_cam = jnp.broadcast_to(
        jnp.asarray(inputs.mesh.verts)[None] + jnp.asarray([[0.0, 0.0, 0.6]]),
        (args.batch,) + inputs.mesh.verts.shape,
    )
    raster = jax.jit(
        lambda v: rasterize(v, mesh.faces, K_crop, S, S, mesh.face_valid, 128).zbuf
    )
    timeit(raster, verts_cam, iters=args.iters, vary=0,
           name=f"rasterize {syn.num_faces}f @ {S}^2")

    splat = jax.jit(lambda v: splat_depth(v, inputs.intrinsics, 320, 320))
    timeit(splat, verts_cam, iters=args.iters, name="splat_depth 2048v @ 320^2")

    enc = ImageFeaEncoder()
    img = jnp.zeros((args.batch, S, S, 3))
    pe = enc.init(jax.random.PRNGKey(0), img, img)
    encf = jax.jit(lambda p, a, b: enc.apply(p, a, b))
    timeit(encf, pe, img, img, iters=args.iters, name=f"image encoder x2 @ {S}^2")

    f8 = S // 8
    fmap = jnp.zeros((args.batch, f8, f8, 256))
    corr_build = jax.jit(lambda a, b: corr_ops.build_corr_pyramid(a, b).levels[0])
    timeit(corr_build, fmap, fmap, iters=args.iters, name=f"corr pyramid build @ {f8}^2")

    pyr = corr_ops.build_corr_pyramid(fmap, fmap)
    coords = jnp.zeros((args.batch, f8, f8, 2))
    lookup = jax.jit(lambda c: corr_ops.corr_lookup(pyr, c, 4))
    timeit(lookup, coords, iters=args.iters, name="corr lookup r=4")

    depth = jnp.ones((args.batch, S, S)) * 0.6
    target = jnp.zeros((args.batch, S, S, 2))
    weight = jnp.ones((args.batch, S, S, 2))
    lmf = jax.jit(
        lambda T: lm_lib.reprojection_optim(T, target, weight, depth, K_crop, 1)
    )
    timeit(lmf, jnp.broadcast_to(jnp.eye(4), (args.batch, 4, 4)),
           iters=args.iters, name=f"LM step @ {S}^2")

    # --- full paths ---
    desc3d, ctx3d = jax.jit(
        lambda p, pyr_: model.apply(p, pyr_, method=RNNPose.encode_3d)
    )(params, inputs.pyramid)
    fwd = jax.jit(
        lambda p, x, d, c: model.apply(
            p, x, train=False, cached_desc3d=d, cached_ctx3d=c
        )["Ti_pred"]
    )
    timeit(fwd, params, inputs, desc3d, ctx3d, iters=args.iters, vary=2,
           name="FULL eval forward (cached 3D)")

    enc3 = jax.jit(lambda p, pyr_: model.apply(p, pyr_, method=RNNPose.encode_3d))
    timeit(enc3, params, inputs.pyramid, iters=args.iters, name="encode_3d (KPConv x2)")

    tx = build_optimizer(OptimizerConfig(total_steps=1000), params)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, donate=False)
    if args.train_cost:
        compiled = step.lower(params, opt_state, inputs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        ma = compiled.memory_analysis()
        print(
            f"train step cost (remat={args.remat}, B={args.batch}): "
            f"{float(ca.get('flops', float('nan'))) / 1e9:.1f} GFLOP, "
            f"HBM args {ma.argument_size_in_bytes / 2**30:.3f} GB, "
            f"temp {ma.temp_size_in_bytes / 2**30:.3f} GB, "
            f"peak-est {(ma.argument_size_in_bytes + ma.temp_size_in_bytes + ma.output_size_in_bytes - ma.alias_size_in_bytes) / 2**30:.3f} GB",
            flush=True,
        )
    timeit(step, params, opt_state, inputs, iters=max(args.iters // 2, 2),
           vary=0, name="FULL train step (fwd+bwd+opt)")

    if args.trace:
        import os

        from ..utils.profiling import trace

        # Separate captures: the eval forward AND the full train step
        # (fwd+bwd+optimizer) — the train step never had a device-op
        # attribution before round 5 (VERDICT r4 weak #4). Feed both to
        # tools/parse_trace.py.
        with trace(os.path.join(args.trace, "eval")):
            jax.block_until_ready(fwd(params, inputs, desc3d, ctx3d))
        with trace(os.path.join(args.trace, "train")):
            jax.block_until_ready(step(params, opt_state, inputs))
        print(f"traces written to {args.trace}/{{eval,train}}")


if __name__ == "__main__":
    main()
