"""Data-parallel SPMD semantics proof: gradients from the mesh-sharded step
must match the single-device full-batch gradients.

This is the TPU-native analog of validating DDP's gradient all-reduce
(`tools/train.py:570-571` in the reference): under pjit the psum is inserted
by XLA from the shardings. A broken collective (sum instead of mean, missing
psum, wrong axis) is off by O(n_devices) or decorrelates the gradient; f32
drift between two different XLA compilations of this deep recurrent pipeline
only perturbs it at the ~1e-4 level. We assert on the gradient *vector*
(cosine + norm ratio), not per-element equality — near-zero components can
flip sign under benign drift without carrying any weight in the update.
(The optimizer step is NOT compared: Adam's first step is ~lr*sign(g), which
amplifies exactly those near-zero sign flips.)
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two full-model grad compiles on 1 CPU core

from rnnpose_tpu.data.synthetic import SyntheticConfig, make_synthetic_inputs
from rnnpose_tpu.models.refiner import RefinerConfig
from rnnpose_tpu.models.rnnpose import RNNPose, RNNPoseConfig
from rnnpose_tpu.parallel import mesh as mesh_lib


def _setup(batch_size):
    syn_cfg = SyntheticConfig(
        image_size=64, batch_size=batch_size, num_verts=128, num_faces=256,
        subdivisions=2, num_corr=64, kp_layers=2, kp_dl=0.02,
        fx=100.0, fy=100.0,
    )
    inputs, kp_cfg = make_synthetic_inputs(syn_cfg, with_corr=True)
    cfg = RNNPoseConfig(
        desc_kp=dataclasses.replace(kp_cfg, final_feats_dim=32),
        ctx_kp=dataclasses.replace(kp_cfg, final_feats_dim=256,
                                   normalize_output=False),
        # f32 everywhere: bf16 (the serving default) drifts ~1e-2 between
        # different XLA compilations, which would drown the thresholds.
        # render_iters=2 keeps the multi-render-iteration unroll boundary
        # (incl. the legacy Tij-clobber loss path, which only affects
        # non-final render iterations) covered under sharding — the driver's
        # dryrun_multichip runs render_iters=1 for compile cost.
        refiner=RefinerConfig(render_iters=2, gru_iters=1, zoom_crop_size=32,
                              corr_levels=2, raster_chunk=64,
                              mixed_precision=False),
    )
    return RNNPose(cfg), jax.tree.map(jnp.asarray, inputs)


def _flat(tree):
    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(tree)]
    )


def test_sharded_grads_match_single_device():
    n = 4
    assert len(jax.devices()) >= n, "conftest must force the virtual mesh"
    model, inputs = _setup(batch_size=n)
    params = model.init(jax.random.PRNGKey(0), inputs, train=False)

    @jax.jit
    def loss_and_grad(p, batch):
        return jax.value_and_grad(
            lambda p_: model.apply(p_, batch, train=True)["loss"]
        )(p)

    # single device, full batch
    loss_ref, g_ref = loss_and_grad(params, inputs)

    # n-device mesh, batch sharded over 'data'; params replicated. XLA
    # inserts the gradient all-reduce from the shardings.
    mesh = mesh_lib.make_mesh(jax.devices()[:n])
    with jax.set_mesh(mesh):
        p_rep = mesh_lib.replicate_params(params, mesh)
        batch = mesh_lib.shard_batch(inputs, mesh, batch_size=n)
        loss_sh, g_sh = loss_and_grad(p_rep, batch)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-3)

    u_ref, u_sh = _flat(g_ref), _flat(g_sh)
    assert np.isfinite(u_ref).all() and np.isfinite(u_sh).all()
    assert np.linalg.norm(u_ref) > 0
    cos = float(
        np.dot(u_ref, u_sh) / (np.linalg.norm(u_ref) * np.linalg.norm(u_sh))
    )
    ratio = float(np.linalg.norm(u_sh) / np.linalg.norm(u_ref))
    assert cos > 0.9999, f"gradient direction diverged: cos={cos}"
    assert 0.999 < ratio < 1.001, f"gradient magnitude diverged: ratio={ratio}"


def test_loss_decomposes_over_batch():
    """The total training loss must be the mean of per-sample losses: the
    reference trains bs=1/GPU with DDP gradient averaging, so any batch-
    coupled reduction (e.g. a sum over batch in one term) silently reweights
    the YAML loss balance at batch>1 and breaks DP-sharding equivalence
    (regression: point_alignment_loss summed over batch)."""
    n = 4
    model, inputs = _setup(batch_size=n)
    params = model.init(jax.random.PRNGKey(0), inputs, train=False)

    @jax.jit
    def loss_of(batch):
        return model.apply(params, batch, train=True)["loss"]

    full = float(loss_of(inputs))

    def take(i):
        return jax.tree.map(
            lambda x: x[i : i + 1]
            if hasattr(x, "ndim") and x.ndim > 0 and x.shape[0] == n
            else x,
            inputs,
        )

    per_sample = [float(loss_of(take(i))) for i in range(n)]
    np.testing.assert_allclose(full, np.mean(per_sample), rtol=1e-4)
