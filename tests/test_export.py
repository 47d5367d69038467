"""AOT serving export round-trip (`utils/export.py`, `tools/export_model`).

Exports the eval forward for the cpu platform (the per-platform raster
backend means a cpu artifact carries the scan sweep — the tpu artifact is
produced the same way, only the lowering target differs), serializes to
disk, deserializes, and checks the artifact reproduces the direct forward
bit-for-bit shape- and value-wise. The standalone-consumer test then
proves the serving claim for real: a subprocess with `rnnpose_tpu` and
`flax` imports BANNED deserializes the artifact and reproduces the
expected output from the saved example batch. No reference analog: the
reference ships no deployment path beyond its Python eval scripts.
"""
import dataclasses
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnpose_tpu.data.synthetic import SyntheticConfig, make_synthetic_inputs
from rnnpose_tpu.models.refiner import RefinerConfig
from rnnpose_tpu.models.rnnpose import RNNPose, RNNPoseConfig
from rnnpose_tpu.utils.export import (
    call_exported,
    export_eval_forward,
    load_exported,
    save_exported,
    serving_args,
    serving_leaf_paths,
)

pytestmark = pytest.mark.slow


def _tiny_model():
    syn = SyntheticConfig(
        image_size=64, batch_size=1, num_verts=128, num_faces=256,
        subdivisions=2, kp_layers=2, kp_dl=0.03,
    )
    inputs, kp_cfg = make_synthetic_inputs(syn, with_corr=False)
    cfg = RNNPoseConfig(
        desc_kp=dataclasses.replace(kp_cfg, final_feats_dim=32),
        ctx_kp=dataclasses.replace(
            kp_cfg, final_feats_dim=256, normalize_output=False
        ),
        refiner=RefinerConfig(
            render_iters=1, gru_iters=2, zoom_crop_size=48, corr_levels=2,
            raster_chunk=64,
        ),
    )
    inputs = jax.tree.map(jnp.asarray, inputs)
    model = RNNPose(cfg)
    params = jax.jit(lambda k: model.init(k, inputs, train=False))(
        jax.random.PRNGKey(0)
    )
    desc3d, ctx3d = jax.jit(
        lambda p, pyr: model.apply(p, pyr, method=RNNPose.encode_3d)
    )(params, inputs.pyramid)
    return model, params, inputs, desc3d, ctx3d


def test_export_roundtrip(tmp_path):
    model, params, inputs, desc3d, ctx3d = _tiny_model()

    exported = export_eval_forward(
        model, params, inputs, desc3d, ctx3d, platforms=("cpu",)
    )
    path = str(tmp_path / "model.jaxexp")
    leaf_paths = serving_leaf_paths(params, inputs, desc3d, ctx3d)
    manifest = save_exported(
        exported, path, extra_manifest={"note": "test"}, leaf_paths=leaf_paths
    )
    assert manifest["platforms"] == ["cpu"]
    assert manifest["bytes"] > 1000
    assert len(leaf_paths) == len(serving_args(params, inputs, desc3d, ctx3d))

    reloaded, manifest2 = load_exported(path)
    assert manifest2["note"] == "test"

    got = call_exported(reloaded, params, inputs, desc3d, ctx3d, inputs.T_init)
    want = jax.jit(
        lambda p, i, d, c, t: model.apply(
            p, i._replace(T_init=t), train=False,
            cached_desc3d=d, cached_ctx3d=c,
        )["Ti_pred"]
    )(params, inputs, desc3d, ctx3d, inputs.T_init)
    assert got.shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # A fresh T_init flows through the artifact (tracking-server contract).
    T2 = inputs.T_init + jnp.asarray(
        np.random.RandomState(0).randn(1, 4, 4).astype(np.float32) * 1e-3
    )
    got2 = call_exported(reloaded, params, inputs, desc3d, ctx3d, T2)
    assert np.isfinite(np.asarray(got2)).all()
    assert not np.allclose(np.asarray(got2), np.asarray(got))


_CONSUMER = textwrap.dedent("""
    import sys

    class _Ban:
        BANNED = ("rnnpose_tpu", "flax")

        def find_spec(self, name, path=None, target=None):
            if name.split(".")[0] in self.BANNED:
                raise ImportError(f"banned import in consumer: {name}")
            return None

    sys.meta_path.insert(0, _Ban())

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")

    artifact, npz_path = sys.argv[1], sys.argv[2]
    data = np.load(npz_path)
    leaves = [data[k] for k in sorted(k for k in data.files
                                      if k.startswith("leaf_"))]
    exported = jax.export.deserialize(open(artifact, "rb").read())
    got = exported.call(data["T_init"], *leaves)
    np.testing.assert_allclose(
        np.asarray(got), data["expected"], atol=1e-6)
    print("CONSUMER_OK", np.asarray(got).shape)
""")


def test_export_standalone_consumer(tmp_path):
    """A process that can NOT import the repo or flax runs the artifact."""
    from rnnpose_tpu.tools.export_model import main

    out = str(tmp_path / "standalone.jaxexp")
    npz = str(tmp_path / "example.npz")
    main(
        [
            "--out", out, "--platform", "cpu", "--batch", "1",
            "--image_size", "64", "--verts", "128", "--faces", "256",
            "--zoom", "48", "--render_iters", "1", "--gru_iters", "2",
            "--corr_levels", "2", "--raster_chunk", "64",
            "--save_example", npz,
        ]
    )
    script = str(tmp_path / "consumer.py")
    with open(script, "w") as f:
        f.write(_CONSUMER)
    proc = subprocess.run(
        [sys.executable, script, out, npz],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CONSUMER_OK" in proc.stdout


def test_export_cli(tmp_path):
    from rnnpose_tpu.tools.export_model import main

    out = str(tmp_path / "cli.jaxexp")
    manifest = main(
        [
            "--out", out, "--platform", "cpu", "--batch", "1",
            "--image_size", "64", "--verts", "128", "--faces", "256",
            "--zoom", "48", "--render_iters", "1", "--gru_iters", "2",
            "--corr_levels", "2", "--raster_chunk", "64",
            "--selftest",
        ]
    )
    assert manifest["platforms"] == ["cpu"]
