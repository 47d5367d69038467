"""CLI smoke tests: synthetic train/eval runs end-to-end on the CPU mesh."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # CLI end-to-end runs (~5 min CPU)


@pytest.mark.slow
def test_train_cli_synthetic(tmp_path):
    from rnnpose_tpu.tools.train import main

    model_dir = str(tmp_path / "run")
    main([
        "--model_dir", model_dir, "--synthetic", "--steps", "3",
        "--display_step", "1", "--syn_image_size", "64", "--syn_zoom", "32",
    ])
    assert os.path.exists(os.path.join(model_dir, "log.json.lst"))
    assert os.path.exists(os.path.join(model_dir, "config_resolved.yml"))
    assert os.path.exists(os.path.join(model_dir, "checkpoints.json"))
    with open(os.path.join(model_dir, "log.json.lst")) as f:
        recs = [json.loads(l) for l in f]
    assert any("loss" in r for r in recs)
    assert all(np.isfinite(r["loss"]) for r in recs if "loss" in r)
    # refuses to reuse the model_dir without --resume (reference guard)
    with pytest.raises(RuntimeError):
        main(["--model_dir", model_dir, "--synthetic", "--steps", "1",
              "--syn_image_size", "64", "--syn_zoom", "32"])


@pytest.mark.slow
def test_eval_cli_synthetic(capsys):
    from rnnpose_tpu.tools.eval import main

    overall = main(["--synthetic", "--syn_image_size", "64", "--syn_zoom", "32"])
    assert overall["seq_len"] == 1
    assert "add01" in overall


def test_eval_cli_parity_preset(capsys):
    """--parity runs the reference-exact mode (full-res LM/corr, f32) end
    to end (VERDICT r1 #5c)."""
    from rnnpose_tpu.tools.eval import main

    overall = main(
        ["--synthetic", "--syn_image_size", "64", "--syn_zoom", "32",
         "--parity"]
    )
    assert "add01" in overall


def test_apply_parity_preset_fields():
    from rnnpose_tpu.config.defaults import (
        apply_parity_preset,
        build_model_config,
        default_config,
    )

    cfg = apply_parity_preset(build_model_config(default_config()))
    assert cfg.refiner.lm_res == "full"
    assert cfg.refiner.corr_weight_res == "full"
    assert cfg.refiner.mixed_precision is False


def test_convert_torch_state_dict(rng):
    """Round-trip a synthetic torch-layout state dict into flax params."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from rnnpose_tpu.models.convert import (
        SUPERPOINT_MAP,
        convert_conv,
        torch_to_flax,
    )
    from rnnpose_tpu.models.superpoint import SuperPoint2D

    m = SuperPoint2D(descriptor_dim=32)
    x = jnp.zeros((1, 16, 16, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    sub = params["params"]

    # synthetic torch weights with the right shapes for a couple of layers
    sd = {
        "conv1a.weight": rng.randn(64, 3, 3, 3).astype(np.float32),
        "conv1a.bias": rng.randn(64).astype(np.float32),
        "convDb.weight": rng.randn(32, 256, 1, 1).astype(np.float32),
        "convDb.bias": rng.randn(32).astype(np.float32),
        "unrelated.weight": rng.randn(4, 4).astype(np.float32),
    }
    new_sub, skipped = torch_to_flax(sd, SUPERPOINT_MAP, sub)
    np.testing.assert_allclose(
        new_sub["conv1a"]["kernel"], convert_conv(sd["conv1a.weight"])
    )
    np.testing.assert_allclose(new_sub["convDb"]["bias"], sd["convDb.bias"])
    assert "unrelated.weight" in skipped
    # untouched layers keep their init values
    np.testing.assert_allclose(
        new_sub["conv2a"]["kernel"], sub["conv2a"]["kernel"]
    )
