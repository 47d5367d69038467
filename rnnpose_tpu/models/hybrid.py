"""Hybrid 2D/3D descriptor networks.

Re-design of the reference `model/HybridNet.py`:
  * `HybridDescNet` (61-106): SuperPoint2D over the image + KPConv tower over
    the model cloud -> matched-dimension 2D/3D descriptors.
  * `ContextFeatureNet` (29-57): a second KPConv tower producing 256-d
    context features for the GRU initialization.

The reference's eval-time per-class caching of 3D outputs
(`HybridNet.py:91-95`, `RNNPose.py:169-176`) is module *state* there; here
the nets are pure, expose separate `encode_2d` / `encode_3d` methods, and
the cache lives in the inference engine (`models/engine.py`) which
precomputes per-class constants.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .kpconv_net import KPConvConfig, KPFCNN, PointPyramid
from .superpoint import SuperPoint2D

__all__ = ["HybridDescNet", "ContextFeatureNet"]


class HybridDescNet(nn.Module):
    """2D + 3D descriptors in a shared embedding space (dim = descriptor_dim)."""

    descriptor_dim: int = 32
    kp_cfg: KPConvConfig = KPConvConfig(final_feats_dim=32)
    mixed_precision: bool = True   # bf16 SuperPoint convs; False = f32
                                   # bit-parity with the reference forward

    def setup(self):
        self.desc2d_net = SuperPoint2D(
            descriptor_dim=self.descriptor_dim,
            mixed_precision=self.mixed_precision,
            name="desc2d",
        )
        self.desc3d_net = KPFCNN(self.kp_cfg, name="desc3d")

    def encode_2d(
        self,
        image: jnp.ndarray,
        compute_scores: bool = True,
        tail_res: Optional[str] = None,
    ):
        """(B,H,W,3) -> (scores (B,H,W,1) | None, desc (B,H,W,D)).

        `compute_scores=False` skips the (unconsumed) saliency head;
        `tail_res='half'` returns the descriptor field at H/2 x W/2 (see
        `SuperPoint2D.__call__` for both)."""
        return self.desc2d_net(
            image, compute_scores=compute_scores, tail_res=tail_res
        )

    def encode_3d(self, pyramid: PointPyramid) -> jnp.ndarray:
        """model-cloud pyramid -> (B, N, D) descriptors."""
        return self.desc3d_net(pyramid)

    def __call__(self, image: jnp.ndarray, pyramid: PointPyramid):
        scores, desc2d = self.encode_2d(image)
        desc3d = self.encode_3d(pyramid)
        return scores, desc2d, desc3d


class ContextFeatureNet(nn.Module):
    """256-d per-point context features (GRU hidden + input source)."""

    kp_cfg: KPConvConfig = KPConvConfig(final_feats_dim=256, normalize_output=False)

    @nn.compact
    def __call__(self, pyramid: PointPyramid) -> jnp.ndarray:
        return KPFCNN(self.kp_cfg, name="ctx3d")(pyramid)
