"""On-chip ablation of the GRU+LM inner-step stage at shipping shapes.

After the round-3 raster kernel work the inner scans are the top time
consumer (BENCHLOG round 3 item 7: 4.14 ms x3 at B=8). This tool times each
sub-op of one `_InnerStep` iteration standalone at the shipping operating
point (B=8, 240^2 crop -> 30^2 coarse grid, bf16 compute) so optimization
effort lands on the dominant one instead of the guessed one.

Usage: python -m rnnpose_tpu.tools.ablate_inner_step [--batch 8] [--iters 20]
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument(
        "--platform", type=str, default=None,
        help="force a jax platform (e.g. cpu). Must be applied via "
        "os.environ BEFORE importing jax: the axon sitecustomize "
        "overrides the shell-level JAX_PLATFORMS at interpreter startup.",
    )
    args = p.parse_args(argv)
    if args.platform:
        import os

        os.environ["JAX_PLATFORMS"] = args.platform

    import jax
    import jax.numpy as jnp

    from ..geometry import lm as lm_lib
    from ..models.raft import BasicUpdateBlock
    from ..ops import corr as corr_ops
    from ..ops.sampler import bilinear_sample

    B = args.batch
    S = 240
    s8 = S // 8  # 30
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    bf16 = jnp.bfloat16

    fmap1 = jax.random.normal(ks[0], (B, s8, s8, 256), bf16)
    fmap2 = jax.random.normal(ks[1], (B, s8, s8, 256), bf16)
    coords = (
        jax.random.uniform(ks[2], (B, s8, s8, 2), jnp.float32) * (s8 - 1)
    )

    # 1. corr pyramid build (once per render iter, i.e. 1/4 the frequency
    #    of the per-GRU-iter ops below).
    build = jax.jit(
        lambda a, b: corr_ops.build_corr_pyramid(a, b, 4).levels
    )
    pyr_levels = build(fmap1, fmap2)
    pyr = corr_ops.CorrPyramid(levels=tuple(pyr_levels), h=s8, w=s8)

    # 2. corr lookup (per GRU iter) — both contraction lowerings.
    lookup = jax.jit(lambda c: corr_ops.corr_lookup(pyr, c, 4, "mulreduce"))
    lookup_mm = jax.jit(lambda c: corr_ops.corr_lookup(pyr, c, 4, "bandmm"))
    corr_feats = lookup(coords)

    # 3. update block (per GRU iter) — inference shape: the mask head is
    #    dead code when emit_full_flow=False, so time both variants.
    h0 = jnp.tanh(jax.random.normal(ks[3], (B, s8, s8, 128), bf16))
    inp = jax.nn.relu(jax.random.normal(ks[4], (B, s8, s8, 128), bf16))
    flow = jax.random.normal(ks[5], (B, s8, s8, 2), jnp.float32)
    blk = BasicUpdateBlock(dtype=bf16)
    # jit the init: run eagerly through the axon relay it is dozens of
    # per-op mini-compiles (minutes); jitted it is one compile.
    pb = jax.jit(blk.init)(ks[6], h0, inp, corr_feats, flow)

    def upd_all(p_, h_, c_):
        return blk.apply(p_, h_, inp, c_, flow)

    def upd_nomask(p_, h_, c_):
        h2, _, d = blk.apply(p_, h_, inp, c_, flow)
        return h2, d

    # 4. LM step on the 1/8 grid (per GRU iter, shipping lm_res='eighth').
    depth_lr = jnp.full((B, s8, s8), 0.6, jnp.float32)
    K_lr = jnp.broadcast_to(
        jnp.asarray([260.0, 260.0, 120.0, 120.0]) / 8.0, (B, 4)
    )
    w_lr = jnp.ones((B, s8, s8, 2), jnp.float32)
    T0 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

    def lm(t_, c_):
        return lm_lib.reprojection_optim(t_, c_, w_lr, depth_lr, K_lr, 1)

    # 5. similarity weight on the 1/8 grid (per GRU iter).
    geo1 = jax.random.normal(ks[7], (B, s8, s8, 32), jnp.float32)
    geo2 = jax.random.normal(ks[0], (B, s8, s8, 32), jnp.float32)

    def simw(c_):
        warped = bilinear_sample(geo2, c_)
        dot = jnp.sum(geo1 * warped, axis=-1, keepdims=True)
        w = jnp.exp(-jnp.abs(1.0 - dot))
        return jax.image.resize(w, (B, S, S, 1), "bilinear")

    def simw_lr_only(c_):
        warped = bilinear_sample(geo2, c_)
        dot = jnp.sum(geo1 * warped, axis=-1, keepdims=True)
        return jnp.exp(-jnp.abs(1.0 - dot))

    from .profile_components import timeit

    print(f"B={B}, crop {S}^2 -> coarse {s8}^2, bf16")
    timeit(build, fmap1, fmap2, iters=args.iters, name="corr pyramid build (1x/render)")
    timeit(lookup, coords, iters=args.iters, name="corr lookup r=4 mulreduce")
    timeit(lookup_mm, coords, iters=args.iters, name="corr lookup r=4 bandmm")
    timeit(jax.jit(upd_all), pb, h0, corr_feats, iters=args.iters, vary=1,
           name="update block +mask head")
    timeit(jax.jit(upd_nomask), pb, h0, corr_feats, iters=args.iters, vary=1,
           name="update block (mask DCE'd)")
    timeit(jax.jit(lm), T0, coords, iters=args.iters, vary=1,
           name="LM 1-step @ 30^2")
    timeit(jax.jit(simw), coords, iters=args.iters, name="sim weight + resize")
    timeit(jax.jit(simw_lr_only), coords, iters=args.iters, name="sim weight lr-only")


if __name__ == "__main__":
    main()
