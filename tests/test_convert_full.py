"""Full-model checkpoint conversion round-trip (VERDICT r1 item 2).

Fabricates a reference-shaped `.tckpt` state dict covering every parameter
of the full RNNPose model (key layout of `/root/reference/model/RNNPose.py:61-100`,
`model/HybridNet.py:29-69`, `model/PoseRefiner.py:76`), loads it through
`load_full_checkpoint`, and asserts:

  * zero torch keys are skipped (every reference key routes somewhere);
  * every flax parameter leaf is overwritten (no silent converter gaps);
  * export -> load -> export is the identity (the maps are consistent
    inverses, so trained weights can round-trip back to the reference
    format).
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model init for converter round-trip (~3 min)

from rnnpose_tpu.models.convert import (
    export_reference_state_dict,
    load_full_checkpoint,
)
from rnnpose_tpu.models.rnnpose import RNNPose

from test_rnnpose import tiny_setup

NUM_LAYERS = 2  # tiny_setup's kp_layers


@pytest.fixture(scope="module")
def tiny_params():
    inputs, cfg = tiny_setup(train=False)
    model = RNNPose(cfg)
    params = model.init(jax.random.PRNGKey(0), inputs, train=False)
    return params


def test_export_covers_reference_key_layout(tiny_params):
    sd = export_reference_state_dict(tiny_params, num_layers=NUM_LAYERS)
    keys = set(sd)
    # Spot-check the reference's full-model prefixes (`RNNPose.py:61-100`).
    assert "motion_net.sigma.0" in keys
    assert any(k.startswith("hybrid_desc_net.corr_fea_extractor_2d.conv1a")
               for k in keys)
    assert ("hybrid_desc_net.corr_fea_extractor_3d."
            "encoder_blocks.0.KPConv.weights" in keys)
    assert ("hybrid_desc_net.corr_fea_extractor_3d."
            "encoder_blocks.0.KPConv.kernel_points" in keys)
    assert any(k.startswith("ctx_fea_net.context_fea_extractor_3d.decoder_blocks")
               for k in keys)
    assert any(k.startswith("motion_net.image_fea_enc.") for k in keys)
    assert any(k.startswith("motion_net.cf_net.update_block.") for k in keys)
    # KPConv kernel weights keep the torch [K, Cin, Cout] layout.
    w = sd["hybrid_desc_net.corr_fea_extractor_3d.encoder_blocks.0.KPConv.weights"]
    assert w.ndim == 3
    # SuperPoint convs are torch OIHW.
    k2d = next(k for k in keys if k.endswith("corr_fea_extractor_2d.conv1a.weight"))
    assert sd[k2d].ndim == 4 and sd[k2d].shape[-1] == 3  # 3x3 kernel, OIHW


def test_full_checkpoint_roundtrip_zero_skipped(tiny_params):
    sd = export_reference_state_dict(tiny_params, num_layers=NUM_LAYERS)
    assert sd, "export produced an empty state dict"

    # Perturb every tensor so a successful load must change every flax leaf.
    rng = np.random.RandomState(0)
    sd_new = {k: np.asarray(v) + rng.uniform(0.01, 0.1, np.shape(v)).astype(
        np.float32) for k, v in sd.items()}

    loaded, skipped, ignored = load_full_checkpoint(
        tiny_params, sd_new, num_layers=NUM_LAYERS, strict=True
    )
    assert skipped == []
    assert ignored == []

    # Every flax parameter leaf must have been overwritten.
    flat_old = jax.tree_util.tree_flatten_with_path(tiny_params)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    untouched = [
        jax.tree_util.keystr(path)
        for path, leaf in flat_old
        if np.allclose(np.asarray(leaf), np.asarray(flat_new[path]))
    ]
    assert not untouched, f"converter never wrote: {untouched}"

    # Export of the loaded tree reproduces the perturbed reference dict.
    sd_back = export_reference_state_dict(loaded, num_layers=NUM_LAYERS)
    assert set(sd_back) == set(sd_new)
    for k in sd_new:
        np.testing.assert_allclose(sd_back[k], sd_new[k], atol=0, rtol=0)


def test_unroutable_key_raises_in_strict_mode(tiny_params):
    sd = {"motion_net.nonexistent.weight": np.zeros((4, 4), np.float32)}
    with pytest.raises(KeyError):
        load_full_checkpoint(tiny_params, sd, num_layers=NUM_LAYERS, strict=True)
    _, skipped, _ = load_full_checkpoint(
        tiny_params, sd, num_layers=NUM_LAYERS, strict=False
    )
    assert skipped == ["motion_net.nonexistent.weight"]


def test_ignored_buffers_are_reported_not_fatal(tiny_params):
    sd = {
        "global_step": np.asarray(123),
        "hybrid_desc_net.corr_fea_extractor_3d.epsilon": np.asarray(0.1),
        "some.norm.running_mean": np.zeros((8,), np.float32),
    }
    _, skipped, ignored = load_full_checkpoint(
        tiny_params, sd, num_layers=NUM_LAYERS, strict=True
    )
    assert skipped == []
    assert set(ignored) == set(sd)
