"""RNNPose: the top-level recurrent pose-refinement model.

Re-design of the reference `model/RNNPose.py:49-302`: composes the hybrid
2D/3D descriptor nets, the context-feature net and the PoseRefiner, and
computes the training loss (circle loss on 2D-3D correspondences + motion
losses over the refinement history).

TPU-first differences:
  * Pure function of (params, inputs): per-class mesh constants and eval-time
    descriptor caches (`RNNPose.py:169-176`, `HybridNet.py:91-95`) live
    outside the graph (`models/engine.py`); train-time noisy pose sampling
    (`RNNPose.py:96-124`) happens in the host data pipeline (`data/poses.py`).
  * The loss's dynamic fg/bg pixel indexing (`RNNPose.py:242-270`) becomes
    fixed-size correspondence tensors prepared host-side (padded, masked),
    including the reference's background-negative trick: bg rows carry the
    2D descriptor on BOTH sides with sentinel coordinates 1e6 so background
    pixels cluster together and repel all model descriptors.

A name->class registry mirrors `register_posenet` (`RNNPose.py:29-44`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..train import losses as loss_lib
from .hybrid import ContextFeatureNet, HybridDescNet
from .kpconv_net import KPConvConfig, PointPyramid
from .refiner import MeshAssets, PoseRefiner, RefinerConfig, RefinerOutputs

__all__ = [
    "RNNPoseConfig",
    "RNNPoseInputs",
    "CorrespondenceSet",
    "RNNPose",
    "register_posenet",
    "get_posenet_class",
]

_POSENET_REGISTRY: Dict[str, Type[nn.Module]] = {}


def register_posenet(cls):
    """Name -> class registry (reference `RNNPose.py:29-36`)."""
    _POSENET_REGISTRY[cls.__name__] = cls
    return cls


def get_posenet_class(name: str):
    return _POSENET_REGISTRY[name]


@dataclasses.dataclass(frozen=True)
class RNNPoseConfig:
    descriptor_dim: int = 32
    ctx_dim: int = 256
    desc_kp: KPConvConfig = KPConvConfig(final_feats_dim=32)
    ctx_kp: KPConvConfig = KPConvConfig(final_feats_dim=256, normalize_output=False)
    refiner: RefinerConfig = RefinerConfig()
    circle: loss_lib.CircleLossConfig = loss_lib.CircleLossConfig()
    motion: loss_lib.RefinerLossConfig = loss_lib.RefinerLossConfig()
    desc2d_eval_tail_res: str = "half"  # eval 2D-descriptor tail: 'half'
                                   # (default, TPU-first serving preset:
                                   # decode3 + the descriptor head at 1/2
                                   # res with the SAME params — the tail is
                                   # ~49% of eval FLOPs, the field is only
                                   # sampled at the refiner's 1/8-grid
                                   # crops, and the A/B on the trained
                                   # sustained-run checkpoint was
                                   # metric-identical, BENCHLOG r4 #6) or
                                   # 'full' (reference-exact; restored by
                                   # apply_parity_preset / --parity).
                                   # Training ALWAYS runs the full-res
                                   # tail — the circle loss indexes
                                   # descriptors at integer full-res
                                   # pixels.


class CorrespondenceSet(NamedTuple):
    """Fixed-size 2D-3D correspondence sample for the circle loss.

    Rows are either fg correspondences (pixel <-> model point), or bg pixels
    (is_bg=1: sentinel coords, 2D descriptor used on both sides), or padding
    (valid=0).
    """

    px: jnp.ndarray          # (B, P, 2) int pixel coords (x, y)
    src_pts: jnp.ndarray     # (B, P, 3) lifted 3D points (1e6 sentinel for bg)
    tgt_pts: jnp.ndarray     # (B, P, 3) model points (1e6 sentinel for bg)
    model_idx: jnp.ndarray   # (B, P) index into the model cloud
    is_bg: jnp.ndarray       # (B, P) 1.0 for background rows
    valid: jnp.ndarray       # (B, P) 1.0 for real rows


class RNNPoseInputs(NamedTuple):
    """One batch (single object class, like the reference `RNNPose.py:158`)."""

    image: jnp.ndarray            # (B, H, W, 3) in [0, 1]
    intrinsics: jnp.ndarray       # (B, 4)
    T_init: jnp.ndarray           # (B, 4, 4) initial/noisy pose
    T_gt: Optional[jnp.ndarray]   # (B, 4, 4) GT pose (None at pure inference)
    mesh: MeshAssets
    pyramid: PointPyramid         # over the model cloud (level0 == mesh verts)
    model_points: jnp.ndarray     # (B, N, 3) points for the 3D-align loss
    point_valid: jnp.ndarray      # (B, N)
    corr: Optional[CorrespondenceSet] = None   # train only


@register_posenet
class RNNPose(nn.Module):
    """Full model. `train=True` returns losses; else refined poses."""

    cfg: RNNPoseConfig = RNNPoseConfig()

    def setup(self):
        self.hybrid_desc_net = HybridDescNet(
            self.cfg.descriptor_dim, self.cfg.desc_kp,
            mixed_precision=self.cfg.refiner.mixed_precision, name="hybrid"
        )
        self.ctx_fea_net = ContextFeatureNet(self.cfg.ctx_kp, name="ctx")
        self.motion_net = PoseRefiner(self.cfg.refiner, name="motion")

    def encode_3d(self, pyramid: PointPyramid):
        """Per-class 3D constants for eval-time caching (`RNNPose.py:169-176`).

        Returns (desc_3d (B, N, D), ctx_fea_3d (B, N, C)). Call via
        `model.apply(params, pyr, method=RNNPose.encode_3d)`.
        """
        return self.hybrid_desc_net.encode_3d(pyramid), self.ctx_fea_net(pyramid)

    def __call__(
        self,
        inputs: RNNPoseInputs,
        train: bool = True,
        cached_desc3d: Optional[jnp.ndarray] = None,
        cached_ctx3d: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        # The saliency scores feed nothing (the reference passes
        # scores_saliency=None into its loss, RNNPose.py:271-276); skipping
        # the head at eval removes 31% of the forward's FLOPs. The eval
        # descriptor tail optionally runs at 1/2 res (desc2d_eval_tail_res).
        tail = "full" if train else self.cfg.desc2d_eval_tail_res
        scores2d, desc2d = self.hybrid_desc_net.encode_2d(
            inputs.image, compute_scores=train, tail_res=tail
        )
        desc2d_scale = inputs.image.shape[1] // desc2d.shape[1]
        desc3d = (
            cached_desc3d
            if cached_desc3d is not None
            else self.hybrid_desc_net.encode_3d(inputs.pyramid)
        )
        ctx3d = (
            cached_ctx3d
            if cached_ctx3d is not None
            else self.ctx_fea_net(inputs.pyramid)
        )

        # Training needs the full-res convex-upsampled flow for the sequence
        # loss; the 1/8-grid inference path skips those 12 upsamples.
        emit_full_flow = train or not (
            self.cfg.refiner.lm_res == "eighth"
            and (
                not self.cfg.refiner.with_corr_weight
                or self.cfg.refiner.corr_weight_res == "eighth"
            )
        )
        outs = self.motion_net(
            image=inputs.image,
            T_init=inputs.T_init,
            intrinsics=inputs.intrinsics,
            mesh=inputs.mesh,
            ctx_fea_3d=ctx3d,
            geofea_3d=desc3d,
            geofea_2d=desc2d,
            T_gt=inputs.T_gt,
            emit_full_flow=emit_full_flow,
            geofea_2d_scale=desc2d_scale,
        )

        ret: Dict[str, Any] = {
            "Ti_pred": outs.Ti_pred,
            "Tij": outs.Tij,
            "scores_2d": scores2d,
            "refiner": outs,
        }
        if train:
            ret.update(self.loss(inputs, desc2d, desc3d, outs))
        return ret

    def loss(
        self,
        inputs: RNNPoseInputs,
        desc2d: jnp.ndarray,
        desc3d: jnp.ndarray,
        outs: RefinerOutputs,
    ) -> Dict[str, jnp.ndarray]:
        """Circle loss + motion losses (reference `RNNPose.py:225-302`)."""
        cfg = self.cfg
        assert inputs.corr is not None, "training requires a CorrespondenceSet"
        corr = inputs.corr

        def one(desc2d_b, desc3d_b, corr_b: CorrespondenceSet):
            px = corr_b.px
            d2 = desc2d_b[px[:, 1], px[:, 0]]            # (P, D)
            d3 = desc3d_b[corr_b.model_idx]              # (P, D)
            tgt_feats = jnp.where(corr_b.is_bg[:, None] > 0, d2, d3)
            cl = loss_lib.circle_loss(
                corr_b.src_pts, corr_b.tgt_pts, d2, tgt_feats,
                corr_b.valid, cfg.circle,
            )
            rec = loss_lib.match_recall(
                corr_b.src_pts, corr_b.tgt_pts, d2, tgt_feats,
                corr_b.valid * (1.0 - corr_b.is_bg), cfg.circle,
            )
            return cl, rec

        cl, rec = jax.vmap(one)(desc2d, desc3d, corr)
        circle = jnp.mean(cl)
        recall = jnp.mean(rec)

        motion = loss_lib.refiner_loss(
            outs, inputs.model_points, inputs.point_valid,
            cfg.motion, cfg.refiner.gru_iters,
        )
        total = cfg.circle.weight * circle + motion["total_loss"]
        return {
            "loss": total,
            "circle_loss": circle,
            "recall": recall,
            "flow_loss": motion["flow_loss"],
            "reproj_loss": motion["reproj_loss"],
            "loss_3d_proj": motion["loss_3d_proj"],
        }
