"""Demo: refine a noisy pose on a synthetic scene and dump visualizations.

The reference ships demo GIFs (`demo/`); this produces the same qualitative
artifacts from scratch — per render-iteration overlays of the model points
at the initial (red) and refined (green) poses, the rendered reference view,
the observed crop, the flow coloring, and the similarity weights.

Usage: python -m rnnpose_tpu.tools.demo --out_dir /tmp/demo
"""
from __future__ import annotations

import argparse
import dataclasses
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="demo_out")
    p.add_argument("--image_size", type=int, default=160)
    p.add_argument("--zoom", type=int, default=120)
    p.add_argument("--ckpt_path", type=str, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.synthetic import SyntheticConfig, make_synthetic_inputs
    from ..models.refiner import RefinerConfig
    from ..models.rnnpose import RNNPose, RNNPoseConfig
    from ..utils.visualize import (
        depth_to_color,
        flow_to_color,
        project_pose_overlay,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    syn = SyntheticConfig(
        image_size=args.image_size, num_verts=512, num_faces=1024,
        subdivisions=3, kp_layers=3, kp_dl=0.012, seed=7,
    )
    inputs, kp_cfg = make_synthetic_inputs(syn, with_corr=False)
    cfg = RNNPoseConfig(
        desc_kp=dataclasses.replace(kp_cfg, final_feats_dim=32),
        ctx_kp=dataclasses.replace(
            kp_cfg, final_feats_dim=256, normalize_output=False
        ),
        refiner=RefinerConfig(zoom_crop_size=args.zoom),
    )
    inputs = jax.tree.map(jnp.asarray, inputs)
    model = RNNPose(cfg)
    params = jax.jit(lambda k: model.init(k, inputs, train=False))(
        jax.random.PRNGKey(0)
    )
    if args.ckpt_path:
        from ..train.checkpoint import restore_checkpoint

        params = restore_checkpoint(args.ckpt_path)["params"]

    out = jax.jit(lambda p, x: model.apply(p, x, train=False))(params, inputs)

    def save(name, arr):
        import cv2

        img = np.clip(np.asarray(arr), 0, 1)
        cv2.imwrite(
            os.path.join(args.out_dir, name),
            cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )

    img = np.asarray(inputs.image[0])
    pts = np.asarray(inputs.model_points[0])[np.asarray(inputs.point_valid[0]) > 0]
    K = np.asarray(inputs.intrinsics[0])
    overlay = project_pose_overlay(img, pts, np.asarray(inputs.T_init[0]), K,
                                   color=(1.0, 0.2, 0.2))
    overlay = project_pose_overlay(overlay, pts, np.asarray(out["Ti_pred"][0]),
                                   K, color=(0.2, 1.0, 0.2))
    overlay = project_pose_overlay(overlay, pts, np.asarray(inputs.T_gt[0]), K,
                                   color=(0.2, 0.4, 1.0))
    save("poses_init-red_refined-green_gt-blue.png", overlay)

    ref = out["refiner"]
    save("syn_img.png", np.asarray(ref.syn_img[0]))
    save("image_crop.png", np.asarray(ref.image_crop[0]))
    save("syn_depth.png", depth_to_color(np.asarray(ref.syn_depth_history[-1, 0])))
    save("flow.png", flow_to_color(np.asarray(ref.flow_history[-1, 0])))
    w = np.asarray(ref.weight[0, ..., 0])
    save("similarity_weight.png", np.stack([w, w, w], axis=-1))
    print(f"wrote 6 visualizations to {args.out_dir}")


if __name__ == "__main__":
    main()
