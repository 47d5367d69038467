"""Export the eval forward as a self-contained serving artifact.

Usage:
  python -m rnnpose_tpu.tools.export_model --out /tmp/rnnpose.jaxexp \
      [--platform tpu] [--batch 1] [--ckpt DIR] [--selftest]

Produces `<out>` (serialized StableHLO via jax.export) and `<out>.json`
(shape/platform manifest incl. per-leaf tree paths). The artifact runs
with jax alone — no repo import, no flax:
`jax.export.deserialize(bytes).call(T_init, *leaves)` where `leaves` is
the flat array list documented in the manifest. `--save_example` writes
an `.npz` of example leaves + the expected output for consumer smoke
tests (see `tests/test_export.py::test_export_standalone_consumer`).

With `--ckpt` the exported example params come from a training checkpoint
(`train/checkpoint.py` manifest layout); otherwise random init. The
example batch is the shipping LINEMOD operating point (320^2 input, 240^2
crop, 2048v/4096f mesh budget) unless --image_size/--verts override.
"""
from __future__ import annotations

import argparse
import dataclasses


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--platform", default="tpu", choices=("tpu", "cpu"))
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--image_size", type=int, default=320)
    p.add_argument("--verts", type=int, default=2048)
    p.add_argument("--faces", type=int, default=4096)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--zoom", type=int, default=240)
    p.add_argument("--render_iters", type=int, default=3)
    p.add_argument("--gru_iters", type=int, default=4)
    p.add_argument("--corr_levels", type=int, default=4,
                   help="correlation pyramid depth; must satisfy "
                   "(zoom/8) >> (corr_levels-1) >= 1")
    p.add_argument("--raster_chunk", type=int, default=128)
    p.add_argument("--selftest", action="store_true",
                   help="deserialize and check the artifact matches the "
                   "direct forward on the example batch (requires the "
                   "target platform to be available locally)")
    p.add_argument("--save_example", type=str, default=None,
                   help="write an .npz with the example T_init, flat "
                   "leaves (leaf_%%05d) and the expected Ti_pred so a "
                   "standalone consumer can smoke-test the artifact")
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        # Build + selftest must run on the target platform: artifacts are
        # platform-locked, and this box force-selects a TPU backend by
        # default (sitecustomize registers the axon PJRT plugin).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ..data.synthetic import SyntheticConfig, make_synthetic_inputs
    from ..models.refiner import RefinerConfig
    from ..models.rnnpose import RNNPose, RNNPoseConfig
    from ..utils.export import (
        call_exported,
        export_eval_forward,
        load_exported,
        save_exported,
        serving_args,
        serving_leaf_paths,
    )

    syn = SyntheticConfig(
        image_size=args.image_size, batch_size=args.batch,
        num_verts=args.verts, num_faces=args.faces,
        subdivisions=4 if args.verts >= 1024 else 3,
        kp_layers=4, kp_dl=0.006,
    )
    inputs, kp_cfg = make_synthetic_inputs(syn, with_corr=False)
    cfg = RNNPoseConfig(
        desc_kp=dataclasses.replace(
            kp_cfg, final_feats_dim=32, first_feats_dim=128,
            gnn_feats_dim=128,
        ),
        ctx_kp=dataclasses.replace(
            kp_cfg, final_feats_dim=256, first_feats_dim=128,
            gnn_feats_dim=128, normalize_output=False,
        ),
        refiner=RefinerConfig(
            zoom_crop_size=args.zoom, render_iters=args.render_iters,
            gru_iters=args.gru_iters, corr_levels=args.corr_levels,
            raster_chunk=args.raster_chunk,
        ),
    )
    inputs = jax.tree.map(jnp.asarray, inputs)
    model = RNNPose(cfg)
    params = jax.jit(lambda k: model.init(k, inputs, train=False))(
        jax.random.PRNGKey(0)
    )
    if args.ckpt:
        from ..train.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.ckpt, params)

    desc3d, ctx3d = jax.jit(
        lambda p, pyr: model.apply(p, pyr, method=RNNPose.encode_3d)
    )(params, inputs.pyramid)

    exported = export_eval_forward(
        model, params, inputs, desc3d, ctx3d, platforms=(args.platform,)
    )
    manifest = save_exported(
        exported, args.out,
        extra_manifest={"image_size": args.image_size, "batch": args.batch},
        leaf_paths=serving_leaf_paths(params, inputs, desc3d, ctx3d),
    )
    print(f"wrote {args.out} ({manifest['bytes']} bytes) "
          f"platforms={manifest['platforms']}")

    if args.selftest or args.save_example:
        reloaded, _ = load_exported(args.out)
        got = call_exported(
            reloaded, params, inputs, desc3d, ctx3d, inputs.T_init
        )
    if args.selftest:
        want = jax.jit(
            lambda p, i, d, c, t: model.apply(
                p, i._replace(T_init=t), train=False,
                cached_desc3d=d, cached_ctx3d=c,
            )["Ti_pred"]
        )(params, inputs, desc3d, ctx3d, inputs.T_init)
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 1e-5, f"selftest mismatch: {err}"
        print(f"selftest OK (max|d|={err:.2e}), poses finite="
              f"{bool(np.isfinite(np.asarray(got)).all())}")
    if args.save_example:
        leaves = serving_args(params, inputs, desc3d, ctx3d)
        np.savez(
            args.save_example,
            T_init=np.asarray(inputs.T_init),
            expected=np.asarray(got),
            **{f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)},
        )
        print(f"wrote example batch to {args.save_example} "
              f"({len(leaves)} leaves)")
    return manifest


if __name__ == "__main__":
    main()
