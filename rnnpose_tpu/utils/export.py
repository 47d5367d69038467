"""AOT model export for serving (`jax.export`).

The reference has no deployment story beyond torch eval scripts wired to
its Python model code. Serving a TPU-native framework wants the opposite:
a self-contained, versioned artifact — traced, lowered to StableHLO for an
explicit target platform, and serialized — that a runtime can execute
without the Python model definition, its config system, or flax.

This module exports the EVAL forward at its serving operating point:
per-class 3D descriptors precomputed once (the reference caches them per
class at eval, `model/RNNPose.py:169-176`). The artifact boundary carries
ONLY standard containers — the callable is `(T_init, *leaves)` where
`leaves` is the flat array list of `(params, inputs, desc3d, ctx3d)` —
so a consumer process needs jax alone to deserialize and run it: no
custom-pytree registrations, no flax, no repo import. The manifest maps
each positional leaf to its tree path. Proven by the subprocess test in
`tests/test_export.py` (consumer runs with `rnnpose_tpu`/`flax` imports
banned); the CLI is `python -m rnnpose_tpu.tools.export_model`.
"""
from __future__ import annotations

import json
from typing import List, Sequence, Tuple

__all__ = [
    "serving_args",
    "serving_leaf_paths",
    "export_eval_forward",
    "call_exported",
    "save_exported",
    "load_exported",
]


def serving_args(params, inputs, desc3d, ctx3d) -> List[object]:
    """Flatten the serving state to the artifact's positional leaf order.

    The order is `jax.tree.leaves((params, inputs, desc3d, ctx3d))` —
    deterministic for fixed tree structure. `inputs.T_init` appears here
    too (16 floats of waste) but is overridden by the explicit `T_init`
    argument inside the artifact; keeping it avoids a special-cased tree
    surgery that consumers would have to replicate.
    """
    import jax

    return jax.tree.leaves((params, inputs, desc3d, ctx3d))


def serving_leaf_paths(params, inputs, desc3d, ctx3d) -> List[str]:
    """Human-readable tree path for each positional leaf (manifest aid)."""
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(
        (params, inputs, desc3d, ctx3d)
    )
    return [jax.tree_util.keystr(path) for path, _ in flat]


def export_eval_forward(
    model,
    params,
    inputs,
    desc3d,
    ctx3d,
    platforms: Sequence[str] = ("tpu",),
):
    """Trace + lower the eval forward and return a `jax.export.Exported`.

    Args:
      model: an `RNNPose` instance.
      params: model variables.
      inputs: an example `RNNPoseInputs` batch — only shapes/dtypes are
        used; `T_init` rides as a separate leading argument so tracking
        servers can feed the previous frame's refined pose.
      desc3d, ctx3d: cached per-class 3D features from
        `RNNPose.encode_3d` (shapes/dtypes only).
      platforms: lowering targets, e.g. ("tpu",) or ("cpu",) — the raster
        backend is selected per platform at lowering time
        (`render/raster.py: lax.platform_dependent`), so a cpu artifact
        carries the scan sweep and a tpu artifact the Pallas kernel.

    The exported callable signature is `(T_init, *leaves)` with `leaves`
    from `serving_args` — the tree structure is closed over at export
    time, so the serialized input pytree is a plain tuple of arrays and
    deserialization needs no pytree registrations.
    """
    import jax

    from jax import export as jexport

    leaves, treedef = jax.tree.flatten((params, inputs, desc3d, ctx3d))

    def serve(T_init, *flat):
        params, inputs, desc3d, ctx3d = jax.tree.unflatten(
            treedef, list(flat)
        )
        inputs = inputs._replace(T_init=T_init)
        out = model.apply(
            params, inputs, train=False,
            cached_desc3d=desc3d, cached_ctx3d=ctx3d,
        )
        return out["Ti_pred"]

    args = (inputs.T_init, *leaves)
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x), x.dtype), args
    )
    return jexport.export(jax.jit(serve), platforms=list(platforms))(*specs)


def call_exported(exported, params, inputs, desc3d, ctx3d, T_init):
    """In-repo convenience: call an artifact with structured arguments."""
    return exported.call(T_init, *serving_args(params, inputs, desc3d, ctx3d))


def save_exported(exported, path: str, extra_manifest: dict | None = None,
                  leaf_paths: Sequence[str] | None = None):
    """Serialize an `Exported` to `path` + a `<path>.json` manifest."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    manifest = {
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "nr_devices": exported.nr_devices,
        "signature": "(T_init, *leaves) -> Ti_pred",
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "bytes": len(data),
    }
    if leaf_paths is not None:
        manifest["leaf_paths"] = list(leaf_paths)
    manifest.update(extra_manifest or {})
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_exported(path: str) -> Tuple[object, dict]:
    """Deserialize an artifact; returns (Exported, manifest).

    Only jax is required — the artifact's input pytree is a plain tuple
    of arrays. Call via `exported.call(T_init, *leaves)` (jittable;
    serving artifacts here are forward-only) or `call_exported`.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    try:
        with open(path + ".json") as f:
            manifest = json.load(f)
    except FileNotFoundError:
        manifest = {}
    return exported, manifest
