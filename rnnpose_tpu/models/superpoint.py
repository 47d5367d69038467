"""SuperPoint-style 2D descriptor network in flax (NHWC).

Re-implementation of the reference `model/descriptor2D.py` (`SuperPoint2D`):
VGG-style shared encoder (4 x {conv, conv, pool}, channels 64/64/128/128,
`descriptor2D.py:46-56`), a 3-stage bilinear-upsample decoder with skip
connections (71-86, 134-141), a full-resolution saliency head (sigmoid or
spatial softmax, 143-155) and an L2-normalized descriptor head (160-164).

The reference warm-starts from `weights/superpoint_v1.pth` with a
shape-filtered non-strict load (90-92, 100-110); the converted-checkpoint
loader in `models/convert.py` mirrors that.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.upsample import upsample2x_bilinear
from .raft import InstanceNorm

__all__ = ["SuperPoint2D"]


def _upsample2x(x):
    # Fixed-stencil 2x bilinear (== jax.image.resize, without the dense
    # interpolation-matrix dot_generals; see ops/upsample.upsample2x_bilinear).
    return upsample2x_bilinear(x)


class _ConcatConv(nn.Module):
    """3x3 'SAME' conv over concat([a, b]) without materializing the concat.

    conv(concat(a, b), K) == conv(a, K[:, :, :ca]) + conv(b, K[:, :, ca:])
    by linearity — the (B, H, W, ca+cb) concatenated tensor (a pure HBM
    copy, ~6.6 ms/step at B=8 in device traces) never exists. The param
    tree ({kernel (3, 3, ca+cb, out), bias}) is identical to `nn.Conv`, so
    reference-checkpoint conversion is unchanged.
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, ca + cb, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        dt = self.dtype or a.dtype

        def conv(inp, k):
            return jax.lax.conv_general_dilated(
                inp.astype(dt), k.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y = conv(a, kernel[:, :, :ca]) + conv(b, kernel[:, :, ca:])
        return y + bias.astype(y.dtype)


class SuperPoint2D(nn.Module):
    """Dense saliency + descriptor network.

    Args mirror the reference config (`template_fw0.5.yml` model.desc_net_2d):
      descriptor_dim: output descriptor channels (32).
      input_dim: 3 for RGB, 1 averages channels first (`descriptor2D.py:113-115`).
      score_normalization: 'sigmoid' | 'softmax' (over all pixels).
      normalize_output: L2-normalize descriptors.
    """

    descriptor_dim: int = 32
    input_dim: int = 3
    score_normalization: str = "sigmoid"
    normalize_output: bool = True
    mixed_precision: bool = True   # bf16 conv compute, f32 params/heads —
                                   # same policy as the refiner encoder/GRU
    desc_tail_res: str = "full"    # 'full': reference-exact (decode3 + the
                                   # heads run at input resolution).
                                   # 'half': decode3 convolves the
                                   # NON-upsampled 1/2-res features (same
                                   # params — conv commutes with the layout,
                                   # not the values) and the heads run at
                                   # 1/2 res; the descriptor field comes
                                   # back at H/2 x W/2. The tail
                                   # (decode3+convDa/Db) is 107 of the
                                   # net's 201 GFLOP/frame at 320^2, and
                                   # eval samples the field at only ~2.7k
                                   # of 102k pixels (refiner 1/8-grid
                                   # crops) — metric impact A/B'd on the
                                   # trained sustained-run checkpoint
                                   # (BENCHLOG r4).

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        compute_scores: bool = True,
        tail_res: Optional[str] = None,
    ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
        """image: (B, H, W, 3) -> (scores (B, H, W, 1) | None, desc (B, H, W, D)).

        `compute_scores=False` skips the saliency head (convPa/convPb) and
        returns scores=None. The head is a full-resolution 256-channel conv
        — 62 of this net's 201 GFLOP/frame at 320^2 (31% of the WHOLE
        model's eval FLOPs) — and its output is consumed by nothing: the
        reference wires it into its contrastive loss as
        `scores_saliency=None` (`model/RNNPose.py:271-276`), a vestige of
        the OverlapPredator-style API. Params are still created at init so
        checkpoint conversion/roundtrip is unaffected.
        """
        dt = jnp.bfloat16 if self.mixed_precision else None
        x = image
        if self.input_dim == 1:
            x = jnp.mean(x, axis=-1, keepdims=True)

        c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
        skips = []
        for i, ch in enumerate((c1, c2, c3, c4)):
            x = nn.relu(nn.Conv(ch, (3, 3), dtype=dt, name=f"conv{i + 1}a")(x))
            x = nn.relu(nn.Conv(ch, (3, 3), dtype=dt, name=f"conv{i + 1}b")(x))
            if i < 3:
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # Decoder: upsample -> conv -> norm -> relu; concat encoder skips
        # (1/4 then 1/2 res), reference `descriptor2D.py:71-88,134-141`.
        x = nn.relu(InstanceNorm()(nn.Conv(c4, (3, 3), dtype=dt, name="decode1")(_upsample2x(x))))
        # upsample commutes with concat (per-channel), so feed the decode
        # convs the two halves separately (`_ConcatConv`).
        x = nn.relu(InstanceNorm()(_ConcatConv(c4, dtype=dt, name="decode2")(
            _upsample2x(x), _upsample2x(skips[2]))))
        tail = tail_res or self.desc_tail_res
        if tail == "half":
            # Same decode3 params applied at 1/2 res on the un-upsampled
            # inputs; the heads then see an H/2 x W/2 field.
            x = nn.relu(InstanceNorm()(_ConcatConv(c4, dtype=dt, name="decode3")(
                x, skips[1])))
        elif tail == "full":
            x = nn.relu(InstanceNorm()(_ConcatConv(c4, dtype=dt, name="decode3")(
                _upsample2x(x), _upsample2x(skips[1]))))
        else:
            raise ValueError(tail)

        # Saliency head (skippable; params always exist for conversion).
        scores = None
        if compute_scores or self.is_initializing():
            pa = nn.relu(InstanceNorm()(nn.Conv(c5, (3, 3), dtype=dt, name="convPa")(x)))
            scores = nn.Conv(1, (1, 1), dtype=dt, name="convPb")(pa).astype(
                jnp.float32
            )
            if self.score_normalization == "sigmoid":
                scores = nn.sigmoid(scores)
            elif self.score_normalization == "softmax":
                b, h, w, _ = scores.shape
                scores = jax.nn.softmax(scores.reshape(b, -1), axis=-1).reshape(b, h, w, 1)
            else:
                raise ValueError(self.score_normalization)
            if not compute_scores:
                scores = None

        # Descriptor head; the L2 normalization below runs in f32.
        da = nn.relu(nn.Conv(c5, (3, 3), dtype=dt, name="convDa")(x))
        desc = nn.Conv(self.descriptor_dim, (1, 1), dtype=dt, name="convDb")(
            da
        ).astype(jnp.float32)
        if self.normalize_output:
            # NaN-safe form (see models/kpconv_net.py): clamp the squared
            # norm so the backward stays finite at an all-zero pixel.
            sq = jnp.sum(jnp.square(desc), axis=-1, keepdims=True)
            desc = desc * jax.lax.rsqrt(jnp.maximum(sq, 1e-16))
        return scores, desc
