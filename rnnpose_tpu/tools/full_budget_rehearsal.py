"""Full-budget A/B vs the reference refiner (VERDICT r2 #2).

`tests/test_dress_rehearsal.py` proves torch/flax refiner parity at a
REDUCED budget (2 render x 2 GRU iters, 160-px images / 128-px crops,
162-vert mesh). Divergence is iterative, so this tool re-runs the same A/B
once at the REFERENCE operating budget —

    3 render x 4 GRU x 1 LM, 320^2 input / 240^2 crop
    (`config/linemod/template_fw0.5.yml:76-81,2-4,15`),
    a `simplify_mesh`-budget mesh (2048 v / 4096 f)

— and logs the measured per-iteration divergence curve (crop intrinsics,
flow, relative pose) plus the final-pose and training-loss deltas, for
PARITY.md. Run on CPU (hours-free, ~10-30 min on one core):

    JAX_PLATFORMS=cpu python -m rnnpose_tpu.tools.full_budget_rehearsal

Imports the reference torch modules through the test shim
(`tests/reference_shim.py`) — the sanctioned oracle path.
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=320)
    p.add_argument("--zoom", type=int, default=240)
    p.add_argument("--render_iters", type=int, default=3)
    p.add_argument("--gru_iters", type=int, default=4)
    p.add_argument("--verts", type=int, default=2048)
    p.add_argument("--faces", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=128)
    args = p.parse_args(argv)

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo, "tests"))
    import reference_shim
    from reference_shim import install_reference, make_fake_renderer

    install_reference()
    # Neutralize the reference's hardcoded pretrained loads (module __init__
    # does torch.load('weights/...'), absent here) — random torch init is
    # what the converter A/B uses.
    torch.load = lambda *a, **k: {}
    torch.nn.Module.load_state_dict = lambda self, sd, strict=True: None
    H = W = args.image_size
    S = args.zoom
    reference_shim._CfgSection.render_image_size = (H, W)
    reference_shim._CfgSection.zoom_crop_size = (S, S)
    torch.manual_seed(0)

    from easydict import EasyDict
    from geometry.transformation import SE3Sequence
    from model.PoseRefiner import PoseRefiner as TorchRefiner

    from rnnpose_tpu.data.synthetic import make_icosphere
    from rnnpose_tpu.geometry import se3 as se3_lib
    from rnnpose_tpu.models.convert import load_full_checkpoint
    from rnnpose_tpu.models.refiner import (
        MeshAssets,
        PoseRefiner,
        RefinerConfig,
    )
    from rnnpose_tpu.render import mesh as mesh_lib

    rng = np.random.RandomState(0)
    V_PAD, F_PAD = args.verts, args.faces

    # ---- shipping-budget mesh (the LINEMOD load path) ----
    m = make_icosphere(4, 0.06)                       # 2562 verts
    m = mesh_lib.simplify_mesh(m, V_PAD, F_PAD)
    m = mesh_lib.orient_faces_outward(m)
    n, nf = m.num_verts, m.num_faces
    colors = rng.rand(n, 3).astype(np.float32)
    m = mesh_lib.TriMesh(m.verts, m.faces, colors)
    pm = mesh_lib.pad_mesh(m, V_PAD, F_PAD)
    print(f"mesh: {n} verts / {nf} faces (padded {V_PAD}/{F_PAD})")

    image = rng.rand(1, H, W, 3).astype(np.float32)
    f = 572.4
    K_vec = np.array([[f, f, W / 2.0, H / 2.0]], np.float32)
    K33 = np.array(
        [[[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]]], np.float32
    )

    def pose(rx, ry, tx, ty, tz):
        xi = np.array([[tx, ty, 0.0, rx, ry, 0.02]], np.float32)
        T = np.array(se3_lib.se3_expm(jnp.asarray(xi)))
        T[:, 2, 3] += tz
        return T.astype(np.float32)

    T_init = pose(0.05, -0.04, 0.004, -0.003, 0.5)
    T_gt = pose(0.01, 0.02, -0.002, 0.005, 0.52)

    ctx = rng.randn(1, n, 256).astype(np.float32) * 0.5
    geo3 = rng.randn(1, n, 32).astype(np.float32)
    geo3 /= np.linalg.norm(geo3, axis=-1, keepdims=True)
    geo2 = rng.randn(1, H, W, 32).astype(np.float32)
    geo2 /= np.linalg.norm(geo2, axis=-1, keepdims=True)
    ctx_pad = np.zeros((1, V_PAD, 256), np.float32)
    ctx_pad[:, :n] = ctx
    geo3_pad = np.zeros((1, V_PAD, 32), np.float32)
    geo3_pad[:, :n] = geo3

    # ---- torch reference refiner at the full budget ----
    cfg_t = EasyDict({
        "with_corr_weight": True, "IS_CALIBRATED": True, "FLOW_NET": "raft",
        "RENDER_ITER_COUNT": args.render_iters, "ITER_COUNT": args.gru_iters,
        "OPTIM_ITER_COUNT": 1, "ONLINE_CROP": True, "RESCALE_IMAGES": False,
        "TRAIN_FLOW_WEIGHT": 0.5, "TRAIN_REPROJ_WEIGHT": 0.3,
        "TRAIN_PCALIGN_WEIGHT": 1.0,
        "raft": EasyDict({
            "small": False, "mixed_precision": False, "fea_net": "default",
            "input_dim": 3, "pretrained_model": None, "iters": 1,
        }),
    })
    # The fake renderer gets the PADDED mesh (pad faces are degenerate and
    # never rasterize; n_valid limits the point-cloud splat), so both sides
    # render identical static shapes with chunk-divisible face counts.
    fake = make_fake_renderer(
        pm.verts, pm.faces, pm.vert_colors * 255.0, chunk=args.chunk,
        n_valid=n,
    )
    tref = TorchRefiner(cfg_t, renderer=fake, is_training=False).eval()

    t0 = time.time()
    with torch.no_grad():
        tout = tref(
            image=torch.from_numpy(
                np.moveaxis(image, -1, 1) * 255.0
            ).contiguous(),
            Ts=SE3Sequence(matrix=torch.from_numpy(T_init)[:, None]),
            intrinsics=torch.from_numpy(K33),
            fea_3d=torch.from_numpy(ctx_pad),
            Tj_gt=SE3Sequence(matrix=torch.from_numpy(T_gt)[:, None]),
            obj_cls=["synthetic"],
            geofea_3d=torch.from_numpy(geo3_pad),
            geofea_2d=torch.from_numpy(np.moveaxis(geo2, -1, 1)).contiguous(),
        )
    print(f"torch forward: {time.time() - t0:.0f}s")

    # ---- flax twin with converted weights ----
    fref = PoseRefiner(RefinerConfig(
        render_iters=args.render_iters, gru_iters=args.gru_iters,
        optim_iters=1, zoom_crop_size=S, mixed_precision=False,
        corr_weight_res="full", lm_res="full", raster_chunk=args.chunk,
    ))
    fin = dict(
        image=jnp.asarray(image),
        T_init=jnp.asarray(T_init),
        intrinsics=jnp.asarray(K_vec),
        mesh=MeshAssets(
            verts=jnp.asarray(pm.verts), faces=jnp.asarray(pm.faces),
            colors=jnp.asarray(pm.vert_colors),
            vert_valid=jnp.asarray(
                (np.arange(V_PAD) < n).astype(np.float32)
            ),
            face_valid=jnp.asarray(np.arange(F_PAD) < nf),
            normals=None,
        ),
        ctx_fea_3d=jnp.asarray(ctx_pad),
        geofea_3d=jnp.asarray(geo3_pad),
        geofea_2d=jnp.asarray(geo2),
        T_gt=jnp.asarray(T_gt),
    )
    t0 = time.time()
    params = jax.eval_shape(
        lambda: fref.init(jax.random.PRNGKey(0), **fin)
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
    sd = {f"motion_net.{k}": v.detach().cpu().numpy()
          for k, v in tref.state_dict().items()}
    wrapped = {"params": {"motion": params["params"]}}
    new, skipped, _ = load_full_checkpoint(wrapped, sd, strict=True)
    assert skipped == []
    params = {"params": new["params"]["motion"]}
    print(f"convert: {time.time() - t0:.0f}s")

    t0 = time.time()
    fouts = jax.jit(lambda p: fref.apply(p, **fin))(params)
    fouts = jax.tree.map(np.asarray, fouts)
    print(f"flax compile+forward: {time.time() - t0:.0f}s")

    # ---- divergence curve ----
    total = args.render_iters * args.gru_iters
    print("\niter |  K_crop max|d|  |  flow max|d|  |  Tij max|d|")
    curve = []
    for it in range(total):
        K_t = tref.intrinsics_history[it].numpy()
        K_f = np.asarray(fouts.intrinsics_history[it])
        dK = np.abs(
            K_f - np.stack([K_t[:, 0, 0], K_t[:, 1, 1],
                            K_t[:, 0, 2], K_t[:, 1, 2]], -1)
        ).max()
        f_t = tref.flow_history[it][-1].numpy()
        f_f = np.moveaxis(np.asarray(fouts.flow_history[it]), -1, 1)
        dflow = np.abs(f_f - f_t).max()

        T_t = tref.residual_pose_history[it].G[:, 0].numpy()
        # The reference's Tij.identity_() clobber retroactively zeroes the
        # stored pose of each render iter's LAST inner iteration (see
        # tests/test_dress_rehearsal.py stage 4); reconstruct from Ti.
        ren = it // args.gru_iters
        if (it + 1) % args.gru_iters == 0 and ren + 1 < args.render_iters:
            T_t = (
                tref.Ti_history[(ren + 1) * args.gru_iters].G[:, 0].numpy()
                @ np.linalg.inv(
                    tref.Ti_history[ren * args.gru_iters].G[:, 0].numpy()
                )
            )
        T_f = np.asarray(fouts.Tij_history[it])
        dT = np.abs(T_f - T_t).max()
        curve.append((dK, dflow, dT))
        print(f"{it:4d} |  {dK:12.3e}  |  {dflow:11.3e}  |  {dT:10.3e}")

    T_t = tout["Ti_pred"].G[:, 0].numpy()
    T_f = np.asarray(fouts.Ti_pred)
    dfinal = np.abs(T_f - T_t).max()
    print(f"\nfinal pose max|d|: {dfinal:.3e}")
    moved = np.abs(T_f - T_init).max()
    print(f"pose moved from init by {moved:.3e} (sanity: refiner acted)")

    # training loss at the full budget
    from functools import partial

    from model.losses import PointAlignmentLoss

    from rnnpose_tpu.train.losses import RefinerLossConfig, refiner_loss

    pts = m.verts[:n]
    with torch.no_grad():
        mres = tref.compute_loss(
            tout["Tij_gt"], tout["syn_depth"],
            intrinsics=torch.from_numpy(K33),
            loss3d=partial(
                PointAlignmentLoss().forward,
                points=torch.from_numpy(pts)[None],
            ),
        )
    pts_pad = np.zeros((1, V_PAD, 3), np.float32)
    pts_pad[:, :n] = pts
    pvalid = (np.arange(V_PAD) < n).astype(np.float32)[None]
    fres = refiner_loss(
        jax.tree.map(jnp.asarray, fouts), jnp.asarray(pts_pad),
        jnp.asarray(pvalid),
        cfg=RefinerLossConfig(
            flow_weight=0.5, reproj_weight=0.3, pcalign_weight=1.0
        ),
        gru_iters=args.gru_iters,
    )
    lt, lf = float(mres["total_loss"]), float(fres["total_loss"])
    print(f"training loss: torch {lt:.6f} vs flax {lf:.6f} "
          f"(rel {abs(lf - lt) / abs(lt):.2e})")
    return curve, dfinal


if __name__ == "__main__":
    main()
