"""Cross-backend numerics validation: TPU vs exact-f32 CPU.

TPU MXU f32 contractions silently run as bf16 passes at DEFAULT precision —
this tool catches any pose-critical path that regresses to that (see
`geometry/precise.py`; a raster z-buffer and a 5 mm pose-compose error were
both found this way). It runs identical inputs through the pose-critical
ops AND the full eval-path forward on both backends and reports max
deviations.

Usage: python -m rnnpose_tpu.tools.numerics_check [--full]
Requires a TPU-visible process (the default axon sandbox setup).
"""
from __future__ import annotations

import argparse
import dataclasses


def _on(dev, fn, *args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    with jax.default_device(dev):
        return jax.tree.map(
            np.asarray, jax.jit(fn)(*jax.tree.map(jnp.asarray, args))
        )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true",
                   help="also compare the full eval forward (slow compile)")
    p.add_argument("--tol_pose", type=float, default=5e-6,
                   help="abs tolerance for pose-critical ops (meters/units)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..geometry import lm as lm_lib
    from ..geometry import projective as proj
    from ..geometry import se3 as se3_lib

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices("tpu")[0]
    rs = np.random.RandomState(0)

    failures = []

    def check(name, fn, *a, tol=None):
        tol = args.tol_pose if tol is None else tol
        ref = _on(cpu, fn, *a)
        out = _on(tpu, fn, *a)
        err = max(
            float(np.abs(r - o).max())
            for r, o in zip(jax.tree.leaves(ref), jax.tree.leaves(out))
        )
        status = "OK " if err <= tol else "FAIL"
        print(f"{status} {name:40s} max|TPU-CPU| = {err:.3e} (tol {tol:g})")
        if err > tol:
            failures.append(name)

    xi = (rs.randn(8, 6) * 0.4).astype(np.float32)
    T = np.asarray(jax.vmap(se3_lib.se3_expm)(jnp.asarray(xi)))
    T2 = np.asarray(
        jax.vmap(se3_lib.se3_expm)(jnp.asarray(rs.randn(8, 6).astype(np.float32) * 0.3))
    )
    X = (rs.randn(8, 500, 3) * 0.1 + np.array([0, 0, 0.6])).astype(np.float32)
    K = np.tile(np.array([[280.0, 280.0, 120.0, 120.0]], np.float32), (8, 1))
    depth = (rs.rand(8, 32, 32) * 0.4 + 0.4).astype(np.float32)
    tgt = (rs.rand(8, 32, 32, 2) * 32).astype(np.float32)
    wgt = rs.rand(8, 32, 32, 2).astype(np.float32)

    check("se3_expm", lambda x: se3_lib.se3_expm(x), xi)
    check("se3_logm(expm)", lambda x: se3_lib.se3_logm(se3_lib.se3_expm(x)), xi)
    check("se3_inverse", se3_lib.se3_inverse, T)
    check("se3_increment (expm @ T)", se3_lib.se3_increment, T, xi * 0.01)
    check("compose+transform_points",
          lambda a, b, x: proj.transform_points(
              se3_lib.se3_increment(a, jnp.zeros((8, 6), jnp.float32)), x
          ) + proj.transform_points(b, x), T, T2, X)
    check("pose_transform_coords",
          lambda t, d, k: lm_lib.pose_transform_coords(t, d, k)[0],
          T * 0.0 + np.eye(4, dtype=np.float32), depth, K, tol=1e-4)
    check("LM reprojection_optim",
          lambda t, tg, w, d, k: lm_lib.reprojection_optim(t, tg, w, d, k, 2),
          np.tile(np.eye(4, dtype=np.float32), (8, 1, 1)), tgt, wgt, depth, K,
          tol=1e-4)

    from ..eval import metrics as M

    pts = (rs.randn(4, 300, 3) * 0.05).astype(np.float32)
    check("ADD metric",
          lambda a, b, p: M.add_error(
              a[:, :3, :3], a[:, :3, 3], b[:, :3, :3], b[:, :3, 3], p
          ),
          T[:4], T2[:4], pts, tol=1e-5)
    check("ADD-S metric",
          lambda a, b, p: M.adds_error(
              a[:, :3, :3], a[:, :3, 3], b[:, :3, :3], b[:, :3, 3], p
          ),
          T[:4], T2[:4], pts, tol=1e-5)

    # Rasterizer (already covered by its own check, cheap to keep here).
    from ..data.synthetic import SyntheticConfig, make_synthetic_inputs
    from ..render.raster import rasterize

    syn = SyntheticConfig(image_size=128, num_verts=512, num_faces=1024,
                          subdivisions=3, kp_layers=2)
    inputs, kp_cfg = make_synthetic_inputs(syn, with_corr=False)
    mesh = inputs.mesh
    verts = np.asarray(mesh.verts)[None] + np.array([[0, 0, 0.6]], np.float32)
    check("rasterize 1024f@128^2 (zbuf)",
          lambda v: rasterize(
              v, jnp.asarray(mesh.faces), jnp.asarray(inputs.intrinsics),
              128, 128, jnp.asarray(mesh.face_valid), 128
          ).zbuf, verts, tol=1e-4)

    # Fused raster + attribute interpolation (the production eval path).
    from ..render.raster import rasterize_with_vis_attrs

    vis = rs.randn(1, mesh.verts.shape[0], 6).astype(np.float32)
    check("fused raster+attrs 1024f@128^2",
          lambda v, a: rasterize_with_vis_attrs(
              v, jnp.asarray(mesh.faces), jnp.asarray(inputs.intrinsics),
              a, 128, 128, jnp.asarray(mesh.face_valid), 128
          )[0], verts, vis, tol=5e-3)

    if args.full:
        from ..models.refiner import RefinerConfig
        from ..models.rnnpose import RNNPose, RNNPoseConfig

        cfg = RNNPoseConfig(
            desc_kp=dataclasses.replace(kp_cfg, final_feats_dim=32),
            ctx_kp=dataclasses.replace(
                kp_cfg, final_feats_dim=256, normalize_output=False
            ),
            refiner=RefinerConfig(
                render_iters=2, gru_iters=2, zoom_crop_size=64,
                corr_levels=2, mixed_precision=False,
            ),
        )
        model = RNNPose(cfg)
        params = _on(cpu, lambda k: model.init(k, jax.tree.map(jnp.asarray, inputs), train=False),
                     jax.random.PRNGKey(0))
        # bf16-free full forward: deviations here are pure geometry/XLA.
        check("FULL eval forward (fp32, Ti_pred)",
              lambda p, x: model.apply(p, x, train=False)["Ti_pred"],
              params, inputs, tol=5e-3)

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        raise SystemExit(1)
    print("\nall numerics checks passed")


if __name__ == "__main__":
    main()
