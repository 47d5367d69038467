"""Activation-level A/B against the reference torch modules (VERDICT r1 #3).

Each test instantiates a reference module from `/root/reference` with its
random torch default init, converts the state dict through
`rnnpose_tpu.models.convert`, runs both implementations on the same random
input, and asserts the activations match. This is the strongest parity
evidence obtainable without the released weight blobs: it proves the
converter maps and the flax forward semantics are simultaneously correct.

Tolerances: 1e-4 for deep conv stacks (fp32 summation-order drift), 1e-5
for shallow ops.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch reference A/B compiles (~3 min)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_shim import install_reference, no_pretrained_loads  # noqa: E402

from rnnpose_tpu.models.convert import (  # noqa: E402
    RAFT_ENCODER_MAP,
    RAFT_UPDATE_MAP,
    SUPERPOINT_MAP,
    torch_to_flax,
)


@pytest.fixture(autouse=True)
def _ref(monkeypatch, tmp_path):
    install_reference(monkeypatch)
    no_pretrained_loads(monkeypatch)
    # kpconv's load_kernels caches dispositions under a cwd-relative
    # 'kernels/dispositions' dir (`kernels/kernel_points.py:394-396`); keep
    # that out of the repo and away from /root/reference.
    monkeypatch.chdir(tmp_path)
    torch.manual_seed(0)


def _sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _assert_all_converted(skipped, sd):
    real = [k for k in skipped if not k.endswith("num_batches_tracked")]
    assert not real, f"unconverted torch keys: {real}"


# ---------------------------------------------------------------------------
# SuperPoint2D (`model/descriptor2D.py:113-178`)
# ---------------------------------------------------------------------------

def test_superpoint_parity(rng):
    from model.descriptor2D import SuperPoint2D as TorchSP

    from rnnpose_tpu.models.superpoint import SuperPoint2D

    from easydict import EasyDict

    tsp = TorchSP(EasyDict(
        {"input_dim": 3, "descriptor_dim": 32, "normalize_output": True}
    )).eval()
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        tout = tsp(torch.from_numpy(x))

    fsp = SuperPoint2D(descriptor_dim=32, mixed_precision=False)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    params = fsp.init(jax.random.PRNGKey(0), xj)
    new, skipped = torch_to_flax(_sd(tsp), SUPERPOINT_MAP, params["params"])
    _assert_all_converted(skipped, _sd(tsp))
    scores, desc = fsp.apply({"params": new}, xj)

    np.testing.assert_allclose(
        np.asarray(scores)[..., 0], tout["scores"][:, 0].numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(desc), (0, 3, 1, 2)),
        tout["descriptors"].numpy(),
        atol=1e-4,
    )


# ---------------------------------------------------------------------------
# RAFT BasicEncoder via ImageFeaEncoder (`model/CFNet.py:26-49`,
# `thirdparty/raft/extractor.py:118-232`)
# ---------------------------------------------------------------------------

def test_image_fea_encoder_parity(rng):
    from model.CFNet import ImageFeaEncoder as TorchEnc

    from rnnpose_tpu.models.cfnet import ImageFeaEncoder

    tenc = TorchEnc(input_dim=3, output_dim=256).eval()
    # The reference normalizes byte-range images (2*(x/255)-1, CFNet.py:42);
    # ours takes [0,1] images. Feed the same underlying image to each.
    img1 = rng.rand(1, 3, 64, 64).astype(np.float32)
    img2 = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t1, t2 = tenc(torch.from_numpy(img1 * 255), torch.from_numpy(img2 * 255))

    fenc = ImageFeaEncoder(output_dim=256, dtype=None)
    j1 = jnp.asarray(np.transpose(img1, (0, 2, 3, 1)))
    j2 = jnp.asarray(np.transpose(img2, (0, 2, 3, 1)))
    params = fenc.init(jax.random.PRNGKey(0), j1, j2)
    new, skipped = torch_to_flax(_sd(tenc), RAFT_ENCODER_MAP, params["params"])
    _assert_all_converted(skipped, _sd(tenc))
    f1, f2 = fenc.apply({"params": new}, j1, j2)

    np.testing.assert_allclose(
        np.transpose(np.asarray(f1), (0, 3, 1, 2)), t1.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(f2), (0, 3, 1, 2)), t2.numpy(), atol=2e-4
    )


# ---------------------------------------------------------------------------
# RAFT BasicUpdateBlock (`thirdparty/raft/update.py:164-188`)
# ---------------------------------------------------------------------------

def test_update_block_parity(rng):
    from easydict import EasyDict
    from thirdparty.raft.update import BasicUpdateBlock as TorchUB

    from rnnpose_tpu.models.raft import BasicUpdateBlock

    args = EasyDict(
        {"small": False, "mixed_precision": False, "fea_net": "default",
         "corr_levels": 4, "corr_radius": 4}
    )
    tub = TorchUB(args, hidden_dim=128).eval()

    B, H, W = 1, 8, 8
    h = rng.randn(B, 128, H, W).astype(np.float32)
    inp = rng.randn(B, 128, H, W).astype(np.float32)
    corr = rng.randn(B, 4 * 81, H, W).astype(np.float32)
    flow = rng.randn(B, 2, H, W).astype(np.float32)
    with torch.no_grad():
        th, tmask, tdelta = tub(
            *(torch.from_numpy(a) for a in (h, inp, corr, flow))
        )

    fub = BasicUpdateBlock(hidden_dim=128)
    tr = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    params = fub.init(
        jax.random.PRNGKey(0), tr(h), tr(inp), tr(corr), tr(flow)
    )
    # The torch keys lack the "update_block." prefix GRU_CFUpdator adds.
    sd = {f"update_block.{k}": v for k, v in _sd(tub).items()}
    new, skipped = torch_to_flax(
        sd, RAFT_UPDATE_MAP, {"update_block": params["params"]}
    )
    _assert_all_converted(skipped, sd)
    fh, fmask, fdelta = fub.apply(
        {"params": new["update_block"]}, tr(h), tr(inp), tr(corr), tr(flow)
    )

    back = lambda a: np.transpose(np.asarray(a), (0, 3, 1, 2))
    np.testing.assert_allclose(back(fh), th.numpy(), atol=1e-4)
    np.testing.assert_allclose(back(fdelta), tdelta.numpy(), atol=1e-4)
    # Reference scales mask logits by 0.25 inside the module (update.py:186).
    np.testing.assert_allclose(back(fmask), tmask.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Correlation pyramid + windowed lookup (`thirdparty/raft/corr.py:12-57`)
# ---------------------------------------------------------------------------

def test_corr_lookup_parity(rng):
    from thirdparty.raft.corr import CorrBlock

    from rnnpose_tpu.ops.corr import build_corr_pyramid, corr_lookup

    B, H, W, C = 1, 16, 16, 32
    f1 = rng.randn(B, C, H, W).astype(np.float32)
    f2 = rng.randn(B, C, H, W).astype(np.float32)
    # Fractional in-range coords (x, y) plus a few out-of-range queries to
    # exercise the zero-padding path.
    cx = rng.uniform(-2.0, W + 1.0, (B, H, W)).astype(np.float32)
    cy = rng.uniform(-2.0, H + 1.0, (B, H, W)).astype(np.float32)
    coords_t = torch.from_numpy(np.stack([cx, cy], axis=1))  # (B, 2, H, W)

    with torch.no_grad():
        tblock = CorrBlock(
            torch.from_numpy(f1), torch.from_numpy(f2), num_levels=4, radius=4
        )
        tout = tblock(coords_t).numpy()  # (B, 4*81, H, W)

    pyr = build_corr_pyramid(
        jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(f2, (0, 2, 3, 1))),
        num_levels=4,
    )
    coords_j = jnp.asarray(np.stack([cx, cy], axis=-1))
    fout = np.transpose(
        np.asarray(corr_lookup(pyr, coords_j, radius=4)), (0, 3, 1, 2)
    )
    np.testing.assert_allclose(fout, tout, atol=1e-4)


# ---------------------------------------------------------------------------
# KPConv rigid convolution (`thirdparty/kpconv/kpconv_blocks.py:139-379`)
# ---------------------------------------------------------------------------

def _random_cloud(rng, n, m, k, radius):
    q = rng.uniform(-1, 1, (n, 3)).astype(np.float32) * radius
    s = rng.uniform(-1, 1, (m, 3)).astype(np.float32) * radius
    # Neighbor lists with some shadow (== m) entries.
    inds = rng.randint(0, m, (n, k)).astype(np.int64)
    shadow = rng.rand(n, k) < 0.2
    inds[shadow] = m
    return q, s, inds


def test_kpconv_layer_parity(rng):
    from kpconv.kpconv_blocks import KPConv as TorchKPConv

    from rnnpose_tpu.ops import kpconv_ops

    radius, extent = 0.05, 0.04
    cin, cout, K = 16, 24, 12
    tkp = TorchKPConv(
        kernel_size=15, p_dim=3, in_channels=cin, out_channels=cout,
        KP_extent=extent, radius=radius,
        fixed_kernel_points="center", KP_influence="linear",
        aggregation_mode="sum",
    ).eval()

    q, s, inds = _random_cloud(rng, 32, 40, K, radius)
    feats = rng.randn(40, cin).astype(np.float32)
    with torch.no_grad():
        tout = tkp(
            torch.from_numpy(q), torch.from_numpy(s),
            torch.from_numpy(inds), torch.from_numpy(feats),
        ).numpy()

    fout = np.asarray(
        kpconv_ops.kpconv(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(inds),
            jnp.asarray(feats),
            jnp.asarray(tkp.kernel_points.detach().numpy()),
            jnp.asarray(tkp.weights.detach().numpy()),
            kp_extent=extent, influence="linear", aggregation="sum",
        )
    )
    np.testing.assert_allclose(fout, tout, atol=1e-4, rtol=1e-4)


def test_kpconv_layer_parity_gaussian_closest(rng):
    from kpconv.kpconv_blocks import KPConv as TorchKPConv

    from rnnpose_tpu.ops import kpconv_ops

    radius, extent = 0.05, 0.04
    cin, cout, K = 8, 8, 10
    tkp = TorchKPConv(
        kernel_size=15, p_dim=3, in_channels=cin, out_channels=cout,
        KP_extent=extent, radius=radius,
        fixed_kernel_points="center", KP_influence="gaussian",
        aggregation_mode="closest",
    ).eval()

    q, s, inds = _random_cloud(rng, 24, 30, K, radius)
    feats = rng.randn(30, cin).astype(np.float32)
    with torch.no_grad():
        tout = tkp(
            torch.from_numpy(q), torch.from_numpy(s),
            torch.from_numpy(inds), torch.from_numpy(feats),
        ).numpy()

    fout = np.asarray(
        kpconv_ops.kpconv(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(inds),
            jnp.asarray(feats),
            jnp.asarray(tkp.kernel_points.detach().numpy()),
            jnp.asarray(tkp.weights.detach().numpy()),
            kp_extent=extent, influence="gaussian", aggregation="closest",
        )
    )
    np.testing.assert_allclose(fout, tout, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# UnaryBlock + the BatchNormBlock-is-InstanceNorm quirk
# (`kpconv_blocks.py:443-517`)
# ---------------------------------------------------------------------------

def _reference_kpconv_config(final_feats_dim, normalize_output):
    """The template's kpconv section (`template_fw0.5.yml:34-72`)."""
    from easydict import EasyDict

    return EasyDict({
        "num_layers": 4, "KP_extent": 2.0, "batch_norm_momentum": 0.02,
        "use_batch_norm": True, "in_points_dim": 3,
        "fixed_kernel_points": "center", "KP_influence": "linear",
        "aggregation_mode": "sum", "modulated": False,
        "first_subsampling_dl": 0.025, "conv_radius": 2.5,
        "deform_radius": 5, "in_features_dim": 1, "first_feats_dim": 128,
        "num_kernel_points": 15, "final_feats_dim": final_feats_dim,
        "normalize_output": normalize_output, "gnn_feats_dim": 128,
    })


@pytest.mark.slow
def test_full_tckpt_key_coverage():
    """The strongest converter statement available without released blobs:
    assemble a full-model state dict from the REAL reference torch modules at
    the template's dims (key prefixes of `model/RNNPose.py:61-100`), and
    assert `load_full_checkpoint` routes every non-ignored key onto a
    shape-matching flax parameter (strict mode, zero skips).

    The flax tree comes from `jax.eval_shape` — full reference dims, no
    compute."""
    import dataclasses

    from easydict import EasyDict
    from model.CFNet import GRU_CFUpdator, ImageFeaEncoder
    from model.descriptor2D import SuperPoint2D as TorchSP
    from model.descriptor3D import KPSuperpoint3Dv2

    from rnnpose_tpu.data.synthetic import SyntheticConfig, make_synthetic_inputs
    from rnnpose_tpu.models.convert import load_full_checkpoint
    from rnnpose_tpu.models.kpconv_net import KPConvConfig
    from rnnpose_tpu.models.refiner import RefinerConfig
    from rnnpose_tpu.models.rnnpose import RNNPose, RNNPoseConfig

    # --- reference-shaped state dict from the real torch modules ---
    sd = {}
    tsp = TorchSP(EasyDict(
        {"input_dim": 3, "descriptor_dim": 32, "normalize_output": True}))
    sd.update({f"hybrid_desc_net.corr_fea_extractor_2d.{k}": v
               for k, v in _sd(tsp).items()})
    t3d = KPSuperpoint3Dv2(_reference_kpconv_config(32, True))
    sd.update({f"hybrid_desc_net.corr_fea_extractor_3d.{k}": v
               for k, v in _sd(t3d).items()})
    tctx = KPSuperpoint3Dv2(_reference_kpconv_config(256, False))
    sd.update({f"ctx_fea_net.context_fea_extractor_3d.{k}": v
               for k, v in _sd(tctx).items()})
    tenc = ImageFeaEncoder(input_dim=3, output_dim=256)
    sd.update({f"motion_net.image_fea_enc.{k}": v
               for k, v in _sd(tenc).items()})
    tgru = GRU_CFUpdator(EasyDict(
        {"small": False, "mixed_precision": False, "fea_net": "default",
         "input_dim": 3, "pretrained_model": None, "iters": 1}))
    sd.update({f"motion_net.cf_net.{k}": v for k, v in _sd(tgru).items()})
    sd["motion_net.sigma.0"] = np.ones((1,), np.float32)
    sd["global_step"] = np.asarray(0)
    assert len(sd) > 200  # the full model, not a stub

    # --- flax param tree at the same dims, via eval_shape (no compute) ---
    syn = SyntheticConfig(
        image_size=64, num_verts=128, num_faces=256, subdivisions=2,
        num_corr=64, kp_layers=4, kp_dl=0.02,
    )
    inputs, kp_cfg = make_synthetic_inputs(syn, with_corr=False)
    cfg = RNNPoseConfig(
        desc_kp=dataclasses.replace(
            kp_cfg, first_feats_dim=128, final_feats_dim=32, gnn_feats_dim=128
        ),
        ctx_kp=dataclasses.replace(
            kp_cfg, first_feats_dim=128, final_feats_dim=256,
            gnn_feats_dim=128, normalize_output=False,
        ),
        refiner=RefinerConfig(render_iters=2, gru_iters=2, zoom_crop_size=32,
                              raster_chunk=64),
    )
    inputs = jax.tree.map(jnp.asarray, inputs)
    model = RNNPose(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), inputs, train=False)
    )
    # ShapeDtypeStruct leaves carry .shape, which is all the converter's
    # strict checks consume.
    _, skipped, ignored = load_full_checkpoint(
        shapes, sd, num_layers=4, strict=True
    )
    assert skipped == []
    assert all(
        k.endswith(("epsilon", "global_step")) or "running_" in k
        for k in ignored
    ), ignored


def test_unary_block_parity(rng):
    from kpconv.kpconv_blocks import UnaryBlock as TorchUnary

    from rnnpose_tpu.models.kpconv_net import UnaryBlock

    tun = TorchUnary(in_dim=16, out_dim=24, use_bn=True, bn_momentum=0.02).eval()
    x = rng.randn(50, 16).astype(np.float32)
    with torch.no_grad():
        tout = tun(torch.from_numpy(x)).numpy()

    fun = UnaryBlock(out_dim=24)
    xj = jnp.asarray(x)[None]  # our blocks are batched (B, N, C)
    mask = jnp.ones((1, 50))
    params = fun.init(jax.random.PRNGKey(0), xj, mask)
    w = tun.mlp.weight.detach().numpy()
    params = {"params": {"mlp": {"kernel": jnp.asarray(np.transpose(w))}}}
    fout = np.asarray(fun.apply(params, xj, mask))[0]
    np.testing.assert_allclose(fout, tout, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Full KPFCNN tower (`model/descriptor3D.py:10-200`): encoder + bottleneck/
# proj + decoder with skip concats, converted through the production
# full-checkpoint route. The layer-level tests above prove each block; this
# proves the composition (strided widths, skip wiring, LastUnary slice,
# InstanceNorm-as-batch-norm quirk) end to end.
# ---------------------------------------------------------------------------

def test_kpfcnn_tower_parity(rng):
    import dataclasses

    import torch as _torch
    from model.descriptor3D import KPSuperpoint3Dv2

    from rnnpose_tpu.data import pyramid as pyr_lib
    from rnnpose_tpu.models.convert import load_full_checkpoint
    from rnnpose_tpu.models.kpconv_net import KPConvConfig, KPFCNN

    # --- one shared cloud + pyramid ---
    cloud = (rng.rand(220, 3).astype(np.float32) - 0.5) * 0.12
    kp_cfg = KPConvConfig(
        num_layers=4, first_subsampling_dl=0.008, conv_radius=2.5,
        kp_extent=2.0, num_kernel_points=15, in_features_dim=1,
        first_feats_dim=128, final_feats_dim=32, gnn_feats_dim=128,
        normalize_output=True,
    )
    limits = pyr_lib.calibrate_neighbor_limits([cloud], kp_cfg)
    pyr = pyr_lib.build_pyramid_arrays(cloud, kp_cfg, limits)

    # --- reference batch format: stacked single cloud, shadow = N_support ---
    batch = {
        "features": _torch.ones((len(cloud), 1)),
        "points": [_torch.from_numpy(p) for p in pyr.points],
        "neighbors": [_torch.from_numpy(n.astype(np.int64)) for n in pyr.neighbors],
        "pools": [_torch.from_numpy(p.astype(np.int64)) for p in pyr.pools],
        "upsamples": [_torch.from_numpy(u.astype(np.int64)) for u in pyr.upsamples],
        "stack_lengths": [[len(p), 0] for p in pyr.points],
    }
    cfg_t = _reference_kpconv_config(32, True)
    cfg_t.first_subsampling_dl = 0.008
    tnet = KPSuperpoint3Dv2(cfg_t).eval()
    with torch.no_grad():
        tout = tnet(batch).numpy()                    # (N0, 32)

    # --- flax twin with converted weights ---
    fnet = KPFCNN(kp_cfg)
    jpyr = pyr_lib.pad_and_batch_pyramids([pyr])      # exact sizes, no pad
    jpyr = jax.tree.map(jnp.asarray, jpyr)
    params = fnet.init(jax.random.PRNGKey(0), jpyr)
    sd = {f"hybrid_desc_net.corr_fea_extractor_3d.{k}": v.detach().numpy()
          for k, v in tnet.state_dict().items()}
    wrapped = {"params": {"hybrid": {"desc3d": params["params"]}}}
    new, skipped, ignored = load_full_checkpoint(wrapped, sd, strict=True)
    assert skipped == []
    fout = np.asarray(
        fnet.apply({"params": new["params"]["hybrid"]["desc3d"]}, jpyr)
    )[0]                                              # (N0, 32)

    np.testing.assert_allclose(fout, tout, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# MetricLoss (circle loss + recall, `model/losses.py:158-305`) and
# PointAlignmentLoss (`losses.py:307-340`)
# ---------------------------------------------------------------------------

def test_circle_loss_parity(rng):
    from easydict import EasyDict
    from model.losses import MetricLoss, PointAlignmentLoss

    from rnnpose_tpu.train.losses import (
        CircleLossConfig,
        circle_loss,
        match_recall,
        point_alignment_loss,
    )

    P, C = 96, 32
    src = rng.rand(P, 3).astype(np.float32) * 0.1
    # Targets: half near-coincident (positives), half far (negatives).
    tgt = src.copy()
    tgt[P // 2:] += 0.2
    tgt += rng.randn(P, 3).astype(np.float32) * 0.002
    f1 = rng.randn(P, C).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = rng.randn(P, C).astype(np.float32)
    f2 /= np.linalg.norm(f2, axis=-1, keepdims=True)
    corr = np.stack([np.arange(P), np.arange(P)], axis=-1)

    tml = MetricLoss(EasyDict({
        "pos_margin": 0.1, "neg_margin": 1.4, "max_points": 256,
        "safe_radius": 0.02, "matchability_radius": 0.06, "pos_radius": 0.01,
    }))
    with torch.no_grad():
        tstats = tml(
            torch.from_numpy(src), torch.from_numpy(tgt),
            torch.from_numpy(f1), torch.from_numpy(f2),
            torch.from_numpy(corr), None, None,
        )

    cfg = CircleLossConfig(pos_radius=0.011, safe_radius=0.02)
    valid = jnp.ones((P,))
    f_loss = circle_loss(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f1), jnp.asarray(f2),
        valid, cfg,
    )
    f_recall = match_recall(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f1), jnp.asarray(f2),
        valid, cfg,
    )
    np.testing.assert_allclose(
        float(f_loss), float(tstats["circle_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(f_recall), float(tstats["recall"]), rtol=1e-5
    )

    # Padding invariance against the torch oracle: padded rows change nothing.
    pad = 32
    src_p = np.concatenate([src, np.full((pad, 3), 1e6, np.float32)])
    tgt_p = np.concatenate([tgt, np.full((pad, 3), 1e6, np.float32)])
    f1_p = np.concatenate([f1, np.zeros((pad, C), np.float32)])
    f2_p = np.concatenate([f2, np.zeros((pad, C), np.float32)])
    valid_p = jnp.concatenate([valid, jnp.zeros((pad,))])
    f_loss_p = circle_loss(
        jnp.asarray(src_p), jnp.asarray(tgt_p),
        jnp.asarray(f1_p), jnp.asarray(f2_p), valid_p, cfg,
    )
    np.testing.assert_allclose(float(f_loss_p), float(f_loss), rtol=1e-5)

    # PointAlignmentLoss on random poses.
    R1, _ = np.linalg.qr(rng.randn(3, 3)); R2, _ = np.linalg.qr(rng.randn(3, 3))
    t1 = rng.randn(3).astype(np.float32); t2 = rng.randn(3).astype(np.float32)
    pts = rng.randn(1, 50, 3).astype(np.float32)
    with torch.no_grad():
        t_pa = PointAlignmentLoss()(
            torch.from_numpy(R1.astype(np.float32))[None],
            torch.from_numpy(t1)[None],
            torch.from_numpy(R2.astype(np.float32))[None],
            torch.from_numpy(t2)[None],
            torch.from_numpy(pts),
        )
    f_pa = point_alignment_loss(
        jnp.asarray(R1.astype(np.float32))[None], jnp.asarray(t1)[None],
        jnp.asarray(R2.astype(np.float32))[None], jnp.asarray(t2)[None],
        jnp.asarray(pts),
    )
    np.testing.assert_allclose(float(f_pa), float(t_pa), rtol=1e-5)


# ---------------------------------------------------------------------------
# LM gradient parity: d(loss)/d(target, weight, T) through the damped
# Gauss-Newton solve (`transformation.py:265-316` + the OptNet cholesky
# backward `geometry/cholesky.py:9-28` + the expm VJP `se3.py:212-222`).
# The reference backs expm with a small-angle approximation; ours is exact
# (`geometry/se3.se3_expm`) — the tolerance below bounds that difference at
# LM-sized updates.
# ---------------------------------------------------------------------------

def test_lm_gradient_parity(rng):
    from geometry.transformation import SE3Sequence

    from rnnpose_tpu.geometry import lm as lm_lib
    from rnnpose_tpu.geometry import se3 as se3_lib

    H = W = 16
    depth_np = (0.45 + rng.rand(1, H, W) * 0.1).astype(np.float32)
    K_vec = np.array([[60.0, 60.0, 8.0, 8.0]], np.float32)
    K33 = np.array([[[60, 0, 8], [0, 60, 8], [0, 0, 1]]], np.float32)
    xi = np.array([[0.01, -0.02, 0.015, 0.02, -0.01, 0.03]], np.float32)
    T0 = np.array(se3_lib.se3_expm(jnp.asarray(xi)), np.float32)
    grid = np.stack(
        np.meshgrid(np.arange(W, dtype=np.float32),
                    np.arange(H, dtype=np.float32), indexing="xy"), -1)
    target_np = (grid[None] + rng.randn(1, H, W, 2).astype(np.float32) * 0.5)
    weight_np = (0.3 + 0.6 * rng.rand(1, H, W, 1)).astype(np.float32)
    G_rand = rng.randn(1, 4, 4).astype(np.float32)

    # --- torch ---
    t_T = torch.from_numpy(T0[:, None]).clone().requires_grad_(True)
    t_tgt = torch.from_numpy(target_np[:, None]).clone().requires_grad_(True)
    t_w = torch.from_numpy(weight_np[:, None]).clone().requires_grad_(True)
    Ts = SE3Sequence(matrix=t_T)
    T_out = Ts.reprojction_optim(
        t_tgt, t_w, torch.from_numpy(depth_np[:, None]),
        torch.from_numpy(K33), num_iters=2,
    )
    loss_t = (T_out.G[:, 0] * torch.from_numpy(G_rand)).sum()
    loss_t.backward()

    # --- jax ---
    def f(Tm, tgt, w1):
        w2 = jnp.broadcast_to(w1, tgt.shape)
        T_ref = lm_lib.reprojection_optim(
            Tm, tgt, w2, jnp.asarray(depth_np), jnp.asarray(K_vec),
            num_iters=2,
        )
        return jnp.sum(T_ref * jnp.asarray(G_rand))

    loss_f, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(
        jnp.asarray(T0), jnp.asarray(target_np), jnp.asarray(weight_np)
    )

    np.testing.assert_allclose(float(loss_f), float(loss_t), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads[1]), t_tgt.grad[:, 0].numpy(), atol=2e-4, rtol=2e-3,
        err_msg="d/d(target) diverges",
    )
    np.testing.assert_allclose(
        np.asarray(grads[2]), t_w.grad[:, 0].numpy(), atol=5e-4, rtol=2e-3,
        err_msg="d/d(weight) diverges",
    )
    np.testing.assert_allclose(
        np.asarray(grads[0]), t_T.grad[:, 0].numpy(), atol=5e-4, rtol=5e-3,
        err_msg="d/d(T_init) diverges",
    )
