"""End-to-end dress rehearsal: full PoseRefiner A/B vs the reference torch
code with converted random weights (VERDICT r1 #9).

The reference `PoseRefiner` accepts an injected renderer; both sides render
through OUR rasterizer (`reference_shim.make_fake_renderer`), so this A/B
isolates the entire refinement pipeline downstream of rendering — splat-bbox
crop window, crop intrinsics, grid_sample image crops, RAFT encoder, corr
pyramid + lookup, GRU update, convex upsampling, descriptor similarity
weighting (incl. the reference's normalize/align_corners quirk), the damped
Gauss-Newton pose solve, and the Ti/Tij composition across render and GRU
iterations — with weights converted through the production
`models/convert.load_full_checkpoint` path.

Tolerances: renders are bit-identical (same rasterizer); one f32 conv stack
drifts ~1e-4; flow drift feeds the LM whose output is contractive (damped),
so poses land ~1e-4. The reference LM runs fp64 vs our fp32+Jacobi — the A/B
bounds that difference too.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import reference_shim  # noqa: E402
from reference_shim import (  # noqa: E402
    install_reference,
    make_fake_renderer,
    no_pretrained_loads,
)

from rnnpose_tpu.data.synthetic import make_icosphere  # noqa: E402
from rnnpose_tpu.geometry import se3 as se3_lib  # noqa: E402
from rnnpose_tpu.models.convert import load_full_checkpoint  # noqa: E402
from rnnpose_tpu.models.refiner import (  # noqa: E402
    MeshAssets,
    PoseRefiner,
    RefinerConfig,
)
from rnnpose_tpu.render import mesh as mesh_lib  # noqa: E402

# The reference's RAFT corr lookup normalizes by (W-1) per pyramid level
# (`thirdparty/raft/utils/utils.py`), so the 4-level pyramid needs
# S/8 / 2^3 >= 2 -> S >= 128 to avoid a 1x1 level dividing by zero.
H = W = 160     # full-image size
S = 128         # zoom-crop size
V_PAD, F_PAD = 192, 320


@pytest.fixture(autouse=True)
def _ref(monkeypatch, tmp_path):
    install_reference(monkeypatch)
    no_pretrained_loads(monkeypatch)
    monkeypatch.setattr(
        reference_shim._CfgSection, "render_image_size", (H, W)
    )
    monkeypatch.setattr(
        reference_shim._CfgSection, "zoom_crop_size", (S, S)
    )
    monkeypatch.chdir(tmp_path)
    torch.manual_seed(0)


def _scene(rng):
    m = make_icosphere(2, 0.06)                    # 162 v / 320 f
    n = m.num_verts
    colors = rng.rand(n, 3).astype(np.float32)
    m = mesh_lib.TriMesh(m.verts, m.faces, colors)
    pm = mesh_lib.pad_mesh(m, V_PAD, F_PAD)

    image = rng.rand(1, H, W, 3).astype(np.float32)

    K_vec = np.array([[200.0, 200.0, 80.0, 80.0]], np.float32)
    K33 = np.array(
        [[[200.0, 0, 80.0], [0, 200.0, 80.0], [0, 0, 1.0]]], np.float32
    )

    def pose(rx, ry, tx, ty, tz):
        xi = np.array([[tx, ty, tz - 0.0, rx, ry, 0.02]], np.float32)
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

    # Padded copies for the flax side (padded verts are never rendered:
    # their faces are marked invalid).
    ctx_pad = np.zeros((1, V_PAD, 256), np.float32)
    ctx_pad[:, :n] = ctx
    geo3_pad = np.zeros((1, V_PAD, 32), np.float32)
    geo3_pad[:, :n] = geo3

    return dict(
        mesh=m, padded=pm, image=image, K_vec=K_vec, K33=K33,
        T_init=T_init, T_gt=T_gt, ctx=ctx, geo3=geo3, geo2=geo2,
        ctx_pad=ctx_pad, geo3_pad=geo3_pad, n=n,
    )


def _torch_refiner(sc):
    from easydict import EasyDict
    from model.PoseRefiner import PoseRefiner as TorchRefiner

    cfg = EasyDict({
        "with_corr_weight": True,
        "IS_CALIBRATED": True,
        "FLOW_NET": "raft",
        "RENDER_ITER_COUNT": 2,
        "ITER_COUNT": 2,
        "OPTIM_ITER_COUNT": 1,
        "ONLINE_CROP": True,
        "RESCALE_IMAGES": False,
        "TRAIN_FLOW_WEIGHT": 0.5,
        "TRAIN_REPROJ_WEIGHT": 0.3,
        "TRAIN_PCALIGN_WEIGHT": 1.0,
        "raft": EasyDict({
            "small": False, "mixed_precision": False, "fea_net": "default",
            "input_dim": 3, "pretrained_model": None, "iters": 1,
        }),
    })
    fake = make_fake_renderer(
        sc["mesh"].verts, sc["mesh"].faces, sc["mesh"].vert_colors * 255.0
    )
    return TorchRefiner(cfg, renderer=fake, is_training=False).eval()


def _flax_refiner():
    return PoseRefiner(RefinerConfig(
        render_iters=2, gru_iters=2, optim_iters=1, zoom_crop_size=S,
        mixed_precision=False, corr_weight_res="full", lm_res="full",
        raster_chunk=64,
    ))


def _flax_inputs(sc):
    pm = sc["padded"]
    mesh_assets = MeshAssets(
        verts=jnp.asarray(pm.verts),
        faces=jnp.asarray(pm.faces),
        colors=jnp.asarray(pm.vert_colors),
        vert_valid=jnp.asarray(
            (np.arange(V_PAD) < pm.num_verts).astype(np.float32)
        ),
        face_valid=jnp.asarray(np.arange(F_PAD) < pm.num_faces),
        normals=None,
    )
    return dict(
        image=jnp.asarray(sc["image"]),
        T_init=jnp.asarray(sc["T_init"]),
        intrinsics=jnp.asarray(sc["K_vec"]),
        mesh=mesh_assets,
        ctx_fea_3d=jnp.asarray(sc["ctx_pad"]),
        geofea_3d=jnp.asarray(sc["geo3_pad"]),
        geofea_2d=jnp.asarray(sc["geo2"]),
        T_gt=jnp.asarray(sc["T_gt"]),
    )


def test_pose_refiner_dress_rehearsal(rng):
    from geometry.transformation import SE3Sequence

    sc = _scene(rng)
    tref = _torch_refiner(sc)

    # --- converted weights through the production full-checkpoint path ---
    sd = {f"motion_net.{k}": v.detach().cpu().numpy()
          for k, v in tref.state_dict().items()}
    fref = _flax_refiner()
    fin = _flax_inputs(sc)
    params = fref.init(jax.random.PRNGKey(0), **fin)
    wrapped = {"params": {"motion": params["params"]}}
    new, skipped, ignored = load_full_checkpoint(wrapped, sd, strict=True)
    assert skipped == []
    params = {"params": new["params"]["motion"]}

    # --- torch forward ---
    with torch.no_grad():
        tout = tref(
            image=torch.from_numpy(
                np.moveaxis(sc["image"], -1, 1) * 255.0
            ).contiguous(),
            Ts=SE3Sequence(matrix=torch.from_numpy(sc["T_init"])[:, None]),
            intrinsics=torch.from_numpy(sc["K33"]),
            fea_3d=torch.from_numpy(sc["ctx"]),
            Tj_gt=SE3Sequence(matrix=torch.from_numpy(sc["T_gt"])[:, None]),
            obj_cls=["synthetic"],
            geofea_3d=torch.from_numpy(sc["geo3"]),
            geofea_2d=torch.from_numpy(
                np.moveaxis(sc["geo2"], -1, 1)
            ).contiguous(),
        )

    # --- flax forward ---
    fouts = fref.apply(params, **fin)

    # 1. Crop intrinsics (splat-quantized bbox -> window -> (S-1) affine).
    for it in range(4):
        K_t = tref.intrinsics_history[it].numpy()          # (B, 3, 3)
        K_f = np.asarray(fouts.intrinsics_history[it])     # (B, 4)
        np.testing.assert_allclose(
            K_f,
            np.stack([K_t[:, 0, 0], K_t[:, 1, 1],
                      K_t[:, 0, 2], K_t[:, 1, 2]], -1),
            atol=1e-3, rtol=1e-5,
            err_msg=f"crop intrinsics diverge at iter {it}",
        )

    # 2. Rendered depth (same rasterizer through the same crop K -> must be
    # bit-identical on the foreground; the background sentinel differs by
    # convention — pytorch3d zbuf -1 vs our 0 — and is masked out by both
    # pipelines everywhere it is consumed).
    d_t = tout["syn_depth"][0][:, 0].numpy()               # (B, S, S)
    d_f = np.asarray(fouts.syn_depth_history[0])
    np.testing.assert_array_equal(d_f > 0, d_t > 0,
                                  err_msg="foreground masks diverge")
    # atol 1e-3: the torch side computes K_crop through fp64 cv2 affines,
    # ours in f32 — the ~1e-4-relative K difference shifts silhouette-pixel
    # zbuf values by up to ~2e-4.
    np.testing.assert_allclose(np.where(d_t > 0, d_t, 0.0), d_f, atol=1e-3,
                               err_msg="rendered crop depth diverges")

    # 3. Flow after each GRU step.
    for it in range(4):
        f_t = tref.flow_history[it][-1].numpy()            # (B, 2, S, S)
        f_f = np.moveaxis(np.asarray(fouts.flow_history[it]), -1, 1)
        np.testing.assert_allclose(
            f_f, f_t, atol=5e-3,
            err_msg=f"flow diverges at iter {it}",
        )

    # 4. Relative pose after each LM solve. Reference quirk: at each render
    # iteration's top, `Tij.identity_()` (`PoseRefiner.py:242`) mutates the
    # SAME SE3Sequence object already stored in `residual_pose_history`, so
    # the stored pose of the LAST inner iteration of every non-final render
    # iter is retroactively clobbered to identity (the pose composition into
    # Ti happens before and is unaffected). Reconstruct the true value from
    # Ti_history: Tij_true = Ti[next render iter] @ inv(Ti[this render iter]).
    for it in range(4):
        T_t = tref.residual_pose_history[it].G[:, 0].numpy()
        if it == 1:  # clobbered slot (render0/inner1): verify + reconstruct
            np.testing.assert_allclose(T_t, np.eye(4)[None], atol=0)
            T_t = (
                tref.Ti_history[2].G[:, 0].numpy()
                @ np.linalg.inv(tref.Ti_history[0].G[:, 0].numpy())
            )
        T_f = np.asarray(fouts.Tij_history[it])
        np.testing.assert_allclose(
            T_f, T_t, atol=5e-4,
            err_msg=f"Tij diverges at iter {it}",
        )

    # 5. Final refined pose per frame — the headline parity statement.
    T_t = tout["Ti_pred"].G[:, 0].numpy()
    T_f = np.asarray(fouts.Ti_pred)
    np.testing.assert_allclose(T_f, T_t, atol=5e-4)
    # And it actually moved (the refiner did something).
    assert np.abs(T_f - sc["T_init"]).max() > 1e-3

    # 6. Training loss on the SAME outputs: reference `compute_loss`
    # (`PoseRefiner.py:378-430` + PointAlignmentLoss, incl. the clobbered-Tij
    # quirk) vs `train.losses.refiner_loss`. Note compute_loss clears the
    # torch histories, so it must run after stages 1-5.
    from functools import partial

    from model.losses import PointAlignmentLoss

    from rnnpose_tpu.train.losses import RefinerLossConfig, refiner_loss

    pts = sc["mesh"].verts[: sc["n"]]
    with torch.no_grad():
        loss3d = partial(
            PointAlignmentLoss().forward,
            points=torch.from_numpy(pts)[None],
        )
        mres = tref.compute_loss(
            tout["Tij_gt"], tout["syn_depth"],
            intrinsics=torch.from_numpy(sc["K33"]), loss3d=loss3d,
        )
    pts_pad = np.zeros((1, V_PAD, 3), np.float32)
    pts_pad[:, : sc["n"]] = pts
    pvalid = (np.arange(V_PAD) < sc["n"]).astype(np.float32)[None]
    fres = refiner_loss(
        fouts, jnp.asarray(pts_pad), jnp.asarray(pvalid),
        cfg=RefinerLossConfig(
            flow_weight=0.5, reproj_weight=0.3, pcalign_weight=1.0
        ),
        gru_iters=2,
    )
    np.testing.assert_allclose(
        float(fres["total_loss"]), float(mres["total_loss"]),
        rtol=2e-3, err_msg="training loss diverges",
    )


def test_refiner_gradient_parity(rng):
    """Backward-pass parity (VERDICT r2 #7): torch autograd of
    `compute_loss` through ONE render iteration (2 GRU steps) vs `jax.grad`
    on converted weights. Closes the train-parity gap between the LM-level
    gradient A/B (`test_lm_gradient_parity`) and full training equivalence:
    backprop through similarity weighting, the damped solve, the GRU, the
    corr lookup and the image encoder (`model/PoseRefiner.py:378-436`).

    The torch gradient state dict is mapped into the flax tree through the
    SAME production converter routes (transposes included), then compared
    per-parameter by cosine / scaled atol.
    """
    from functools import partial

    from easydict import EasyDict
    from model.losses import PointAlignmentLoss
    from model.PoseRefiner import PoseRefiner as TorchRefiner
    from geometry.transformation import SE3Sequence

    import jax.numpy as jnp

    from rnnpose_tpu.train.losses import RefinerLossConfig, refiner_loss

    sc = _scene(rng)

    cfg_t = EasyDict({
        "with_corr_weight": True, "IS_CALIBRATED": True, "FLOW_NET": "raft",
        "RENDER_ITER_COUNT": 1, "ITER_COUNT": 2, "OPTIM_ITER_COUNT": 1,
        "ONLINE_CROP": True, "RESCALE_IMAGES": False,
        "TRAIN_FLOW_WEIGHT": 0.5, "TRAIN_REPROJ_WEIGHT": 0.3,
        "TRAIN_PCALIGN_WEIGHT": 1.0,
        "raft": EasyDict({
            "small": False, "mixed_precision": False, "fea_net": "default",
            "input_dim": 3, "pretrained_model": None, "iters": 1,
        }),
    })
    fake = make_fake_renderer(
        sc["mesh"].verts, sc["mesh"].faces, sc["mesh"].vert_colors * 255.0
    )
    tref = TorchRefiner(cfg_t, renderer=fake, is_training=True).train()

    # --- torch forward + backward ---
    tout = tref(
        image=torch.from_numpy(
            np.moveaxis(sc["image"], -1, 1) * 255.0
        ).contiguous(),
        Ts=SE3Sequence(matrix=torch.from_numpy(sc["T_init"])[:, None]),
        intrinsics=torch.from_numpy(sc["K33"]),
        fea_3d=torch.from_numpy(sc["ctx"]),
        Tj_gt=SE3Sequence(matrix=torch.from_numpy(sc["T_gt"])[:, None]),
        obj_cls=["synthetic"],
        geofea_3d=torch.from_numpy(sc["geo3"]),
        geofea_2d=torch.from_numpy(
            np.moveaxis(sc["geo2"], -1, 1)
        ).contiguous(),
    )
    pts = sc["mesh"].verts[: sc["n"]]
    # Export weights BEFORE backward (state unchanged by backward, but keep
    # the intent explicit); compute_loss clears histories, so call it last.
    sd = {f"motion_net.{k}": v.detach().cpu().numpy()
          for k, v in tref.state_dict().items()}
    mres = tref.compute_loss(
        tout["Tij_gt"], tout["syn_depth"],
        intrinsics=torch.from_numpy(sc["K33"]),
        loss3d=partial(
            PointAlignmentLoss().forward, points=torch.from_numpy(pts)[None]
        ),
    )
    mres["total_loss"].backward()
    grad_sd = {
        f"motion_net.{k}": (
            p.grad.detach().cpu().numpy()
            if p.grad is not None
            else np.zeros(p.shape, np.float32)
        )
        for k, p in tref.named_parameters()
    }

    # --- flax twin: converted weights, jax.grad of the same total loss ---
    fref = PoseRefiner(RefinerConfig(
        render_iters=1, gru_iters=2, optim_iters=1, zoom_crop_size=S,
        mixed_precision=False, corr_weight_res="full", lm_res="full",
        raster_chunk=64,
    ))
    fin = _flax_inputs(sc)
    params = fref.init(jax.random.PRNGKey(0), **fin)
    wrapped = {"params": {"motion": params["params"]}}
    new, skipped, _ = load_full_checkpoint(wrapped, sd, strict=True)
    assert skipped == []
    params = {"params": new["params"]["motion"]}

    pts_pad = np.zeros((1, V_PAD, 3), np.float32)
    pts_pad[:, : sc["n"]] = pts
    pvalid = (np.arange(V_PAD) < sc["n"]).astype(np.float32)[None]

    def loss_fn(p):
        fouts = fref.apply(p, **fin)
        return refiner_loss(
            fouts, jnp.asarray(pts_pad), jnp.asarray(pvalid),
            cfg=RefinerLossConfig(
                flow_weight=0.5, reproj_weight=0.3, pcalign_weight=1.0
            ),
            gru_iters=2,
        )["total_loss"]

    lf, gf = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(
        float(lf), float(mres["total_loss"].detach()), rtol=2e-3,
        err_msg="forward loss diverges before comparing gradients",
    )

    # Map the torch GRADIENTS through the same converter routes (identical
    # transposes) onto a zeroed flax tree, then compare leaf by leaf.
    zeros = jax.tree.map(np.zeros_like, params)
    wrapped_g = {"params": {"motion": zeros["params"]}}
    conv_g, skipped_g, _ = load_full_checkpoint(wrapped_g, grad_sd, strict=True)
    assert skipped_g == []
    gt_tree = {"params": conv_g["params"]["motion"]}

    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_t = dict(jax.tree_util.tree_leaves_with_path(gt_tree))
    assert len(flat_f) == len(flat_t)
    global_norm = max(
        np.linalg.norm(np.asarray(g)) for _, g in flat_f
    )
    worst = (1.0, None)
    checked = 0
    for path, g_f in flat_f:
        g_t = np.asarray(flat_t[path])
        g_f = np.asarray(g_f)
        nf, nt = np.linalg.norm(g_f), np.linalg.norm(g_t)
        name = jax.tree_util.keystr(path)
        if max(nf, nt) < 1e-6 * global_norm:
            # Mathematically-zero gradients hold pure float noise on both
            # sides (e.g. conv biases immediately followed by InstanceNorm,
            # which is invariant to per-channel shifts) — direction is
            # meaningless there.
            continue
        checked += 1
        cos = float(np.dot(g_f.ravel(), g_t.ravel()) / (nf * nt + 1e-30))
        if cos < worst[0]:
            worst = (cos, name)
        assert cos > 0.999, f"gradient direction diverges at {name}: {cos}"
        ratio = nf / (nt + 1e-30)
        assert 0.99 < ratio < 1.01, (
            f"gradient magnitude diverges at {name}: {ratio}"
        )
    assert checked >= 40, f"only {checked} gradient leaves carried signal"
    print(f"worst gradient cosine over {checked} leaves: "
          f"{worst[0]:.6f} at {worst[1]}")
