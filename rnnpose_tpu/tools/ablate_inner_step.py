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
    p.add_argument("--scan", type=int, default=0,
                   help="N>0: time each sub-op amortized over an N-long "
                   "lax.scan chain (true in-scan per-iter cost; the "
                   "standalone numbers are relay-floor-dominated)")
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
    if args.scan == 0:
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
        return

    # --scan N mode: standalone per-call numbers above share a ~2.5 ms
    # relay dispatch floor larger than the work itself, so they CANNOT
    # attribute the in-scan cost (BENCHLOG r4 item 1). Here each sub-op is
    # chained N times inside ONE `lax.scan` program (output feeds the next
    # iteration, so nothing is DCE'd or pipelined away) and the per-iter
    # cost is (T_scan - T_floor) / N — the same amortized form the real
    # refiner scan runs in.
    N = args.scan
    f32 = jnp.float32

    def scan_time(f, init, name):
        def body(c, _):
            return f(c), ()

        g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=N)[0])
        floor = jax.jit(lambda c: c)
        r = timeit(g, init, iters=args.iters, name=f"[scan x{N}] {name}")
        r0 = timeit(floor, init, iters=args.iters, name=f"[floor]    {name}")
        per = (r - r0) / N  # timeit returns ms
        print(f"  -> {name}: {per:.3f} ms/iter")
        return per

    tiny = 1e-6
    total = 0.0
    total += scan_time(
        lambda c: c + tiny * jnp.mean(
            corr_ops.corr_lookup(pyr, c, 4, "mulreduce").astype(f32)
        ),
        coords, "corr lookup r=4 mulreduce")
    scan_time(
        lambda c: c + tiny * jnp.mean(
            corr_ops.corr_lookup(pyr, c, 4, "bandmm").astype(f32)
        ),
        coords, "corr lookup r=4 bandmm")

    def upd_step(h_):
        h2, _, d = blk.apply(pb, h_, inp, corr_feats, flow)
        return h2 + tiny * jnp.mean(d).astype(h2.dtype)

    total += scan_time(upd_step, h0, "update block (mask DCE'd)")
    scan_time(lambda h_: blk.apply(pb, h_, inp, corr_feats, flow)[0]
              + tiny * jnp.mean(blk.apply(pb, h_, inp, corr_feats, flow)[1]).astype(h_.dtype),
              h0, "update block +mask head")
    total += scan_time(lambda t_: lm(t_, coords), T0, "LM 1-step @ 30^2")
    total += scan_time(
        lambda c: c + tiny * simw_lr_only(c), coords, "sim weight lr-only")
    scan_time(
        lambda c: c + tiny * jnp.mean(simw(c)), coords, "sim weight + resize")

    def full_step(carry):
        c_, h_, t_ = carry
        cf = corr_ops.corr_lookup(pyr, c_, 4, "mulreduce")
        h2, _, d = blk.apply(pb, h_, inp, cf, flow)
        c2 = c_ + d.astype(f32)
        w = simw_lr_only(c2)
        t2 = lm_lib.reprojection_optim(
            t_, c2, jnp.broadcast_to(w, c2.shape), depth_lr, K_lr, 1
        )
        return c2, h2, t2

    full = scan_time(full_step, (coords, h0, T0), "FULL inner step (composed)")
    print(f"sum of parts {total:.3f} ms vs composed {full:.3f} ms")


if __name__ == "__main__":
    main()
