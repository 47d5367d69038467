"""Refiner configuration matrix: the reference-exact paths must keep working
alongside the TPU-first defaults."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # refiner config sweep compiles (~ minutes)

from rnnpose_tpu.models.rnnpose import RNNPose


@pytest.fixture(scope="module")
def tiny():
    from tests.test_rnnpose import tiny_setup

    return tiny_setup()


@pytest.mark.parametrize(
    "overrides",
    [
        dict(corr_weight_res="full", lm_res="full"),          # reference-exact
        dict(corr_weight_res="eighth", lm_res="full"),
        dict(corr_weight_res="eighth", lm_res="eighth"),      # TPU default
        dict(with_corr_weight=False, lm_res="eighth"),
        dict(mixed_precision=False),
        # full parity preset incl. the reference's /255 encoder-input quirk
        dict(corr_weight_res="full", lm_res="full", mixed_precision=False,
             legacy_squash_255=True),
    ],
)
def test_config_matrix_forward(tiny, overrides):
    inputs, cfg = tiny
    cfg2 = dataclasses.replace(
        cfg, refiner=dataclasses.replace(cfg.refiner, **overrides)
    )
    m = RNNPose(cfg2)
    params = m.init(jax.random.PRNGKey(0), inputs, train=False)
    out = m.apply(params, inputs, train=True)
    assert np.isfinite(float(out["loss"]))
    T = np.asarray(out["Ti_pred"])
    assert np.isfinite(T).all()
    R = T[0, :3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=5e-3)


def test_invalid_combo_raises(tiny):
    inputs, cfg = tiny
    cfg2 = dataclasses.replace(
        cfg,
        refiner=dataclasses.replace(
            cfg.refiner, corr_weight_res="full", lm_res="eighth"
        ),
    )
    m = RNNPose(cfg2)
    with pytest.raises(ValueError):
        m.init(jax.random.PRNGKey(0), inputs, train=False)


def test_backface_cull_config(tiny):
    import dataclasses as dc

    import jax as _jax
    import numpy as _np

    from rnnpose_tpu.models.rnnpose import RNNPose as _R

    inputs, cfg = tiny
    cfg2 = dc.replace(cfg, refiner=dc.replace(cfg.refiner, backface_cull=True))
    m = _R(cfg2)
    p = m.init(_jax.random.PRNGKey(0), inputs, train=False)
    out = m.apply(p, inputs, train=False)
    T = _np.asarray(out["Ti_pred"])
    assert _np.isfinite(T).all()
    # the render must still cover a sensible area (culling keeps the front)
    depth = _np.asarray(out["refiner"].syn_depth_history[-1])
    assert (depth > 0).mean() > 0.05
