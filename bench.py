"""Benchmark: full RNNPose refinement forward at the reference operating point.

Measures frames/sec/chip of the eval-path forward (cached per-class 3D
descriptors, 3 render iters x 4 GRU iters x 1 LM step, 320x320 input,
240x240 zoom crop — `config/linemod/template_fw0.5.yml:2-4,15,76-81`) on the
available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
`vs_baseline` is fps relative to an ASSUMED 10 fps reference throughput —
the reference repo publishes no fps numbers and cannot run here (no NVIDIA
GPU; BASELINE.md), so 10 fps is a derivation, not a measurement: RAFT-based
refiners of this iteration budget (3 render x 4 GRU x 1 LM, 12 RAFT-scale
update steps at 240 px plus 2 KPConv towers + SuperPoint per frame) land in
the ~100 ms/frame class on contemporary GPUs. The JSON self-describes this
via `baseline_assumed` and reports both serving points (B=1 single-stream
and B=8 throughput) separately.

The 2048-vert/4096-face mesh budget below IS the shipping LINEMOD budget:
`data/linemod.py` simplifies every model to max_verts=2048/max_faces=4096
at load (watertight vertex clustering, `render/mesh.simplify_mesh`), so the
bench measures the real eval operating point.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

REFERENCE_FPS = 10.0

# v5e peak: 197 TFLOP/s bf16 (394 int8). MFU below is vs bf16 peak — the
# forward runs the serving preset (bf16 encoders/GRU, f32 norms + LM).
PEAK_TFLOPS_BF16 = 197.0


def measure_fps(batch_size: int, render_iters: int = None, gru_iters: int = None):
    import jax
    import jax.numpy as jnp

    from rnnpose_tpu.data.synthetic import SyntheticConfig, make_synthetic_inputs
    from rnnpose_tpu.models.refiner import RefinerConfig
    from rnnpose_tpu.models.rnnpose import RNNPose, RNNPoseConfig

    syn_cfg = SyntheticConfig(
        image_size=320,
        batch_size=batch_size,
        num_verts=2048,
        num_faces=4096,
        subdivisions=4,     # 2562 verts -> capped at 2048
        num_corr=256,
        kp_layers=4,
        kp_dl=0.006,
    )
    inputs, kp_cfg = make_synthetic_inputs(syn_cfg, with_corr=False)
    refiner = RefinerConfig()  # shipping 3 x 4 x 1 at 240
    if render_iters or gru_iters:
        # iteration-budget override (tools/budget_frontier.py grid points)
        refiner = dataclasses.replace(
            refiner,
            render_iters=render_iters or refiner.render_iters,
            gru_iters=gru_iters or refiner.gru_iters,
        )
    cfg = RNNPoseConfig(
        desc_kp=dataclasses.replace(kp_cfg, final_feats_dim=32, first_feats_dim=128, gnn_feats_dim=128),
        ctx_kp=dataclasses.replace(kp_cfg, final_feats_dim=256, first_feats_dim=128, gnn_feats_dim=128, normalize_output=False),
        refiner=refiner,
    )
    inputs = jax.tree.map(jnp.asarray, inputs)

    model = RNNPose(cfg)
    # jit everything incl. init: per-op eager dispatch is pathologically slow
    # through the sandbox's remote-compile TPU relay.
    params = jax.jit(lambda k: model.init(k, inputs, train=False))(
        jax.random.PRNGKey(0)
    )

    # Eval path: per-class 3D features precomputed once (reference caches
    # them per class at eval, `model/RNNPose.py:169-176`).
    desc3d, ctx3d = jax.jit(
        lambda p, pyr: model.apply(p, pyr, method=RNNPose.encode_3d)
    )(params, inputs.pyramid)

    @jax.jit
    def fwd(params, inputs, desc3d, ctx3d, T_init):
        inputs = inputs._replace(T_init=T_init)
        return model.apply(
            params, inputs, train=False,
            cached_desc3d=desc3d, cached_ctx3d=ctx3d,
        )["Ti_pred"]

    # Warmup / compile.
    T = fwd(params, inputs, desc3d, ctx3d, inputs.T_init)
    T.block_until_ready()

    # Hardware-grounded FLOP count of the compiled forward (VERDICT r2 #3):
    # XLA's own cost model on the post-fusion executable, not an estimate.
    try:
        ca = (
            fwd.lower(params, inputs, desc3d, ctx3d, inputs.T_init)
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_total = float(ca.get("flops", float("nan")))
    except Exception:
        flops_total = float("nan")
    gflops_per_frame = flops_total / 1e9 / batch_size

    # Chain the refined pose into the next frame's init (tracking mode) with
    # a distinct small perturbation per frame, so every iteration is a
    # different, sequentially-dependent execution. (Plain chaining converges
    # to a fixpoint after a few frames, and identical executions can be
    # deduplicated by the sandbox's TPU relay, inflating fps by orders of
    # magnitude.)
    import os as _os

    import numpy as _np

    # Entropy seed: the relay's execution-dedup cache persists ACROSS
    # processes, so a fixed jitter seed would replay inputs measured in any
    # earlier run and read back cached results.
    rs = _np.random.RandomState(int.from_bytes(_os.urandom(4), "little"))

    T_base = inputs.T_init

    def measure(iters):
        # Distinct init pose per frame, always centered on the true pose:
        #  * fresh entropy jitters defeat the relay's execution-dedup cache
        #    (which persists across processes);
        #  * re-centering prevents pose drift — a free-running chained pose
        #    diverges off-screen within a few frames, after which renders are
        #    empty and the measured 'frames' do almost no work;
        #  * chaining a (stop-gradient-scaled) dependency on the previous
        #    output keeps frames sequentially ordered.
        jitters = [
            jnp.asarray(rs.randn(*T_base.shape).astype(_np.float32) * 1e-3)
            for _ in range(iters)
        ]
        T_out = T_base
        t0 = time.perf_counter()
        for i in range(iters):
            # 1e-30 (not 0.0): a zero multiplier is foldable by XLA's
            # simplifier, which would sever the sequential dependency and let
            # the relay overlap frames across its backend pool.
            T_in = T_base + jitters[i] + 1e-30 * T_out
            T_out = fwd(params, inputs, desc3d, ctx3d, T_in)
        # The host value read is the ONLY reliable sync through the relay:
        # block_until_ready() returns before execution completes (measured
        # 0.16 ms "latency" for a 227-GFLOP forward). It must sit inside the
        # timing window.
        finite = bool(jnp.isfinite(T_out).all())
        dt = (time.perf_counter() - t0) / iters
        assert finite, "bench produced invalid poses"
        return dt

    # Asymptotic long-chain measurement: short chains are dominated by
    # startup/queueing through the relay (chain-10 reads ~2x slower per frame
    # than chain-160); 40+ frames reaches the plateau. Best-of-3 guards
    # against relay load spikes (contention only ever slows); the per-repeat
    # readings are reported so every quoted fps carries a variance bound
    # (BENCHLOG protocol; a 5% cross-run drift at B=1 went unexplained in
    # round 4 because single captures carried no spread).
    measure(8)  # queue warmup
    B = inputs.image.shape[0]
    reps = [B / measure(40) for _ in range(3)]
    return max(reps), gflops_per_frame, reps


def main():
    # Two serving operating points, both per-class-homogeneous batches:
    # single-stream tracking (B=1, latency-bound — the reference's eval
    # protocol is bs=1, `utils/eval_metric.py:309`) and throughput serving
    # (B=8 — with the fused raster kernel + matmul-form resampling the
    # MXU-heavy parts finally amortize). The headline is the best
    # frames/s/chip; both points are reported in the JSON. The chain
    # protocol (sequential dependency + in-window host read) applies per
    # batch step.
    results = {b: measure_fps(b) for b in (1, 8)}
    fps_by_batch = {b: r[0] for b, r in results.items()}
    gflops_by_batch = {b: r[1] for b, r in results.items()}
    reps_by_batch = {b: r[2] for b, r in results.items()}

    def _spread_pct(b):
        reps = reps_by_batch[b]
        return round(100.0 * (max(reps) - min(reps)) / max(reps), 2)
    best_b = max(fps_by_batch, key=fps_by_batch.get)
    fps = fps_by_batch[best_b]

    # Hardware-grounded utilization (VERDICT r2 #3): FLOPs from the compiled
    # executable's cost analysis; MFU vs v5e bf16 peak.
    def _util(b):
        g = gflops_by_batch[b]
        if g != g:  # NaN: cost_analysis unavailable on this backend
            return None, None
        achieved = g * fps_by_batch[b] / 1000.0  # TFLOP/s
        return round(achieved, 3), round(achieved / PEAK_TFLOPS_BF16, 4)

    ach1, mfu1 = _util(1)
    ach8, mfu8 = _util(8)

    print(
        json.dumps(
            {
                "metric": "refine_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 3),
                "batch_size": best_b,
                "fps_b1": round(fps_by_batch[1], 3),
                "fps_b8": round(fps_by_batch[8], 3),
                "fps_b1_runs": [round(x, 2) for x in reps_by_batch[1]],
                "fps_b8_runs": [round(x, 2) for x in reps_by_batch[8]],
                "fps_b1_spread_pct": _spread_pct(1),
                "fps_b8_spread_pct": _spread_pct(8),
                "gflops_per_frame_b1": round(gflops_by_batch[1], 2),
                "gflops_per_frame_b8": round(gflops_by_batch[8], 2),
                "achieved_tflops_b1": ach1,
                "achieved_tflops_b8": ach8,
                "mfu_b1": mfu1,
                "mfu_b8": mfu8,
                "peak_tflops_bf16": PEAK_TFLOPS_BF16,
                "baseline_assumed": REFERENCE_FPS,
                "baseline_note": (
                    "reference publishes no fps and cannot run here; 10 fps "
                    "is the assumed GPU throughput of its iteration budget"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
