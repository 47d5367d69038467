"""Integration tests: full RNNPose forward + loss + gradients on tiny shapes."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model integration on tiny shapes (~5 min CPU)

from rnnpose_tpu.data.synthetic import SyntheticConfig, make_synthetic_inputs
from rnnpose_tpu.models.kpconv_net import KPConvConfig
from rnnpose_tpu.models.refiner import RefinerConfig
from rnnpose_tpu.models.rnnpose import RNNPose, RNNPoseConfig, get_posenet_class
from rnnpose_tpu.train import losses as loss_lib


def tiny_setup(train=True):
    syn_cfg = SyntheticConfig(
        image_size=64, num_verts=128, num_faces=256, subdivisions=2,
        num_corr=64, kp_layers=2, kp_dl=0.02, fx=100.0, fy=100.0,
    )
    inputs, kp_cfg = make_synthetic_inputs(syn_cfg, with_corr=train)
    small_kp = dataclasses.replace(kp_cfg, final_feats_dim=32)
    ctx_kp = dataclasses.replace(
        kp_cfg, final_feats_dim=256, normalize_output=False
    )
    cfg = RNNPoseConfig(
        desc_kp=small_kp,
        ctx_kp=ctx_kp,
        refiner=RefinerConfig(
            render_iters=2, gru_iters=2, zoom_crop_size=32, corr_levels=2,
            raster_chunk=64,
        ),
    )
    inputs = jax.tree.map(jnp.asarray, inputs)
    return inputs, cfg


@pytest.fixture(scope="module")
def model_and_params():
    inputs, cfg = tiny_setup()
    model = RNNPose(cfg)
    params = model.init(jax.random.PRNGKey(0), inputs, train=False)
    return inputs, cfg, model, params


def test_registry():
    assert get_posenet_class("RNNPose") is RNNPose


def test_forward_inference(model_and_params):
    inputs, cfg, model, params = model_and_params
    out = model.apply(params, inputs, train=False)
    B = inputs.image.shape[0]
    assert out["Ti_pred"].shape == (B, 4, 4)
    T = np.asarray(out["Ti_pred"])
    assert np.all(np.isfinite(T))
    # Bottom row must stay homogeneous.
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1.0], (B, 1)), atol=1e-5)
    # Rotation block stays orthonormal through the update chain.
    RtR = np.einsum("bij,bik->bjk", T[:, :3, :3], T[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (B, 1, 1)), atol=1e-3)
    ref = out["refiner"]
    t_total = cfg.refiner.render_iters * cfg.refiner.gru_iters
    assert ref.flow_history.shape[0] == t_total
    assert ref.syn_depth_history.shape[0] == cfg.refiner.render_iters


def test_forward_train_loss(model_and_params):
    inputs, cfg, model, params = model_and_params
    out = model.apply(params, inputs, train=True)
    for k in ("loss", "circle_loss", "recall", "flow_loss", "loss_3d_proj"):
        v = float(np.asarray(out[k]))
        assert np.isfinite(v), f"{k} not finite"
    assert float(out["loss"]) > 0


def test_gradients_finite_and_flow(model_and_params):
    inputs, cfg, model, params = model_and_params

    def loss_fn(p):
        return model.apply(p, inputs, train=True)["loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # Descriptor nets, context net and refiner must ALL receive gradient.
    gp = g["params"]
    for top in ("hybrid", "ctx", "motion"):
        total = sum(
            float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(gp[top])
        )
        assert total > 0, f"no gradient into {top}"


def test_eval_cached_3d_matches(model_and_params):
    inputs, cfg, model, params = model_and_params
    desc3d, ctx3d = model.apply(
        params, inputs.pyramid, method=RNNPose.encode_3d
    )
    out_cached = model.apply(
        params, inputs, train=False, cached_desc3d=desc3d, cached_ctx3d=ctx3d
    )
    out_direct = model.apply(params, inputs, train=False)
    np.testing.assert_allclose(
        out_cached["Ti_pred"], out_direct["Ti_pred"], atol=1e-5
    )


def test_refiner_improves_loss_vs_no_refinement(model_and_params):
    """The LM chain must keep Ti_pred a valid pose not far from init
    (untrained nets -> small refinements, no explosions)."""
    inputs, cfg, model, params = model_and_params
    out = model.apply(params, inputs, train=False)
    d = float(jnp.abs(out["Ti_pred"] - inputs.T_init).max())
    assert d < 1.0, f"untrained refinement exploded: {d}"


def test_jit_forward(model_and_params):
    """jit and eager agree at the ADD level.

    Exact pose equality is NOT expected: fp32 reduction-order differences
    are amplified along the near-null translation/rotation-ambiguity
    direction of the LM normal matrix (condition number ~1e4). The physically
    meaningful comparison is the mean distance of transformed model points
    (the ADD metric), which is insensitive to that direction.
    """
    inputs, cfg, model, params = model_and_params
    f = jax.jit(lambda p, x: model.apply(p, x, train=False)["Ti_pred"])
    T1 = np.asarray(f(params, inputs))
    T1b = np.asarray(f(params, inputs))
    np.testing.assert_array_equal(T1, T1b)  # jit is deterministic
    T2 = np.asarray(model.apply(params, inputs, train=False)["Ti_pred"])
    pts = np.asarray(inputs.model_points[0])
    x1 = pts @ T1[0, :3, :3].T + T1[0, :3, 3]
    x2 = pts @ T2[0, :3, :3].T + T2[0, :3, 3]
    add = np.linalg.norm(x1 - x2, axis=-1).mean()
    # jit and eager use different conv kernels on CPU (~1e-5 deltas), which
    # the untrained recurrence amplifies — only a coarse bound is meaningful.
    assert add < 5e-2, f"jit/eager ADD divergence {add*1000:.2f} mm"


def test_inference_engine(model_and_params):
    from rnnpose_tpu.models.engine import InferenceEngine

    inputs, cfg, model, params = model_and_params
    eng = InferenceEngine(model, params)
    out1 = eng.refine("cat", inputs)
    assert "cat" in eng._cache
    out2 = eng.refine("cat", inputs)  # cached path
    np.testing.assert_allclose(out1["Ti_pred"], out2["Ti_pred"], atol=1e-6)
    # Compare against the jitted direct forward (eager differs by conv-kernel
    # choice on CPU, see test_jit_forward).
    direct = jax.jit(lambda p, x: model.apply(p, x, train=False)["Ti_pred"])(
        params, inputs
    )
    np.testing.assert_allclose(
        np.asarray(out1["Ti_pred"]), np.asarray(direct), atol=1e-4
    )
    eng.evict()
    assert not eng._cache
