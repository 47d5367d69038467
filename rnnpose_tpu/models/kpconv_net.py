"""KPConv encoder-decoder 3D descriptor network (flax, padded static shapes).

Re-implementation of the reference `model/descriptor3D.py` (`KPSuperpoint3Dv2`)
and the block zoo in `thirdparty/kpconv/kpconv_blocks.py:389-650`:

  architecture (num_layers=4, `descriptor3D.py:16-29`):
    simple, resnetb,
    (resnetb_strided, resnetb, resnetb) x 3,
    bottleneck 1x1 (1024 -> gnn_feats_dim) + proj 1x1 (`descriptor3D.py:91-94`),
    (nearest_upsample, unary) x 2, nearest_upsample, last_unary
  with skip concats on the decoder and final output sliced to
  `final_feats_dim` (+2 extra channels in last_unary, `kpconv_blocks.py:407`)
  and optionally L2-normalized (`descriptor3D.py:187-191`).

TPU-first differences:
  * The ragged stacked-cloud batch becomes a **padded pyramid** of static
    shapes per level with validity masks (see `data/pyramid.py`); batch is
    vmapped.
  * The reference's 'BatchNormBlock' is actually InstanceNorm1d over the
    whole point stack (`kpconv_blocks.py:465-472`, affine=False): here a
    masked per-cloud, per-channel normalization.
  * Neighbor gathers + kernel-point aggregation are the MXU-shaped einsums
    in `ops/kpconv_ops.py`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import kpconv_ops
from ..ops.kernel_points import make_kernel_points

__all__ = ["KPConvConfig", "PointPyramid", "KPFCNN"]


@dataclasses.dataclass(frozen=True)
class KPConvConfig:
    """Mirrors the YAML kpconv section (`config/linemod/template_fw0.5.yml:34-52`)."""

    num_layers: int = 4
    first_subsampling_dl: float = 0.025
    conv_radius: float = 2.5
    kp_extent: float = 2.0          # relative; absolute = r * kp_extent / conv_radius
    num_kernel_points: int = 15
    in_features_dim: int = 1
    first_feats_dim: int = 128
    final_feats_dim: int = 32
    gnn_feats_dim: int = 128
    influence: str = "linear"
    aggregation: str = "sum"
    normalize_output: bool = True

    def layer_radius(self, layer: int) -> float:
        return self.first_subsampling_dl * self.conv_radius * (2.0 ** layer)


class PointPyramid:
    """Padded multi-resolution point pyramid (built host-side).

    Per level l (0 = finest), all padded to static sizes:
      points[l]:    (B, N_l, 3)
      masks[l]:     (B, N_l) 1.0 for real points
      neighbors[l]: (B, N_l, K_l) int32 indices into level l (shadow = N_l)
      pools[l]:     (B, N_{l+1}, K_l) indices into level l (for strided conv)
      upsamples[l]: (B, N_l, K') indices into level l+1 (for nearest upsample)
    """

    def __init__(self, points, masks, neighbors, pools, upsamples):
        self.points = list(points)
        self.masks = list(masks)
        self.neighbors = list(neighbors)
        self.pools = list(pools)
        self.upsamples = list(upsamples)

    @property
    def num_levels(self):
        return len(self.points)

    def tree_flatten(self):
        return (
            (self.points, self.masks, self.neighbors, self.pools, self.upsamples),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    PointPyramid,
    lambda p: p.tree_flatten(),
    PointPyramid.tree_unflatten,
)


def masked_instance_norm(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-5):
    """Per-cloud, per-channel normalization over valid points.

    x: (B, N, C), mask: (B, N). Matches the reference's InstanceNorm1d-over-
    the-stack semantics (`kpconv_blocks.py:465-472`), restricted to real
    points so padding cannot shift the statistics.
    """
    m = mask[..., None]
    count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=1, keepdims=True) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=1, keepdims=True) / count
    return (x - mean) * jax.lax.rsqrt(var + eps) * m


class UnaryBlock(nn.Module):
    """Linear (no bias) + masked instance norm + leaky relu
    (reference `kpconv_blocks.py:482-517`)."""

    out_dim: int
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, mask):
        x = nn.Dense(self.out_dim, use_bias=False, name="mlp")(x)
        x = masked_instance_norm(x, mask)
        if not self.no_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class KPConvLayer(nn.Module):
    """One rigid KPConv with its kernel-point constants."""

    out_dim: int
    radius: float        # neighborhood radius (kernel init radius)
    extent: float        # per-kernel-point influence
    num_kernel_points: int = 15
    influence: str = "linear"
    aggregation: str = "sum"

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x):
        """Batched: q_pts (B,N,3), s_pts (B,M,3), neighb_inds (B,N,K), x (B,M,C)."""
        # Kernel-point dispositions are a *parameter* so converted reference
        # checkpoints can install their stored (randomly rotated) layouts
        # (`kpconv_blocks.py:99` keeps them as requires_grad=False
        # Parameters); `train/optim.build_optimizer` always freezes them.
        kp = self.param(
            "kernel_points",
            lambda rng: jnp.asarray(
                make_kernel_points(self.num_kernel_points, self.radius),
                jnp.float32,
            ),
        )
        in_dim = x.shape[-1]
        w = self.param(
            "weights",
            nn.initializers.lecun_normal(),
            (self.num_kernel_points, in_dim, self.out_dim),
        )
        fn = lambda q, s, n, f: kpconv_ops.kpconv(
            q, s, n, f, kp, w, self.extent, self.influence, self.aggregation
        )
        return jax.vmap(fn)(q_pts, s_pts, neighb_inds, x)


class SimpleBlock(nn.Module):
    """KPConv(out//2) + norm + leaky relu (reference `kpconv_blocks.py:545-600`)."""

    out_dim: int
    radius: float
    extent: float
    cfg: KPConvConfig

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x, mask_q):
        x = KPConvLayer(
            self.out_dim // 2, self.radius, self.extent,
            self.cfg.num_kernel_points, self.cfg.influence, self.cfg.aggregation,
            name="KPConv",
        )(q_pts, s_pts, neighb_inds, x)
        return nn.leaky_relu(masked_instance_norm(x, mask_q), 0.1)


class ResnetBottleneckBlock(nn.Module):
    """unary(out//4) -> KPConv(out//4) -> unary(out) + shortcut
    (reference `kpconv_blocks.py:602-680`). Strided variant pools the
    shortcut with max over the pool neighborhood."""

    out_dim: int
    radius: float
    extent: float
    cfg: KPConvConfig
    strided: bool = False

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x, mask_q, mask_s=None):
        in_dim = x.shape[-1]
        if mask_s is None:
            mask_s = mask_q  # non-strided: support level == query level
        if in_dim != self.out_dim // 4:
            y = UnaryBlock(self.out_dim // 4, name="unary1")(x, mask_s)
        else:
            y = x
        y = KPConvLayer(
            self.out_dim // 4, self.radius, self.extent,
            self.cfg.num_kernel_points, self.cfg.influence, self.cfg.aggregation,
            name="KPConv",
        )(q_pts, s_pts, neighb_inds, y)
        y = nn.leaky_relu(masked_instance_norm(y, mask_q), 0.1)
        y = UnaryBlock(self.out_dim, no_relu=True, name="unary2")(y, mask_q)

        if self.strided:
            shortcut = jax.vmap(kpconv_ops.max_pool)(x, neighb_inds)
        else:
            shortcut = x
        if in_dim != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, no_relu=True, name="unary_shortcut")(
                shortcut, mask_q
            )
        return nn.leaky_relu(y + shortcut, 0.1)


class KPFCNN(nn.Module):
    """The full encoder-decoder ('KPSuperpoint3Dv2' equivalent).

    Call with a PointPyramid and returns (B, N_0, final_feats_dim) features.
    """

    cfg: KPConvConfig = KPConvConfig()

    @nn.compact
    def __call__(self, pyr: PointPyramid, features: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        B, N0 = pyr.points[0].shape[:2]
        if features is None:
            # in_features_dim=1: constant ones (`template_fw0.5.yml:47`).
            features = jnp.ones((B, N0, cfg.in_features_dim), pyr.points[0].dtype)

        def rad(l):
            return cfg.layer_radius(l)

        def ext(l):
            return rad(l) * cfg.kp_extent / cfg.conv_radius

        x = features
        skips: List[jnp.ndarray] = []

        # ---- encoder ----
        out_dim = cfg.first_feats_dim
        x = SimpleBlock(out_dim, rad(0), ext(0), cfg, name="enc_simple")(
            pyr.points[0], pyr.points[0], pyr.neighbors[0], x, pyr.masks[0]
        )
        x = ResnetBottleneckBlock(out_dim, rad(0), ext(0), cfg, name="enc_resnetb_0")(
            pyr.points[0], pyr.points[0], pyr.neighbors[0], x, pyr.masks[0]
        )
        for layer in range(1, cfg.num_layers):
            skips.append(x)
            # strided block: query = coarser level points, support = current.
            # It keeps the CURRENT width; the reference doubles out_dim only
            # *after* appending the strided block (`descriptor3D.py:76-86`),
            # so resnetb_strided is (C -> C) and the following resnetb is
            # (C -> 2C). Required for .tckpt shape compatibility.
            x = ResnetBottleneckBlock(
                out_dim, rad(layer - 1), ext(layer - 1), cfg, strided=True,
                name=f"enc_strided_{layer}",
            )(
                pyr.points[layer], pyr.points[layer - 1], pyr.pools[layer - 1],
                x, pyr.masks[layer], pyr.masks[layer - 1],
            )
            out_dim *= 2
            x = ResnetBottleneckBlock(
                out_dim, rad(layer), ext(layer), cfg, name=f"enc_resnetb_{layer}a"
            )(pyr.points[layer], pyr.points[layer], pyr.neighbors[layer], x, pyr.masks[layer])
            x = ResnetBottleneckBlock(
                out_dim, rad(layer), ext(layer), cfg, name=f"enc_resnetb_{layer}b"
            )(pyr.points[layer], pyr.points[layer], pyr.neighbors[layer], x, pyr.masks[layer])

        # ---- bottleneck (`descriptor3D.py:91-94`) ----
        x = nn.Dense(cfg.gnn_feats_dim, use_bias=True, name="bottle")(x)
        x = nn.Dense(cfg.gnn_feats_dim, use_bias=True, name="proj_gnn")(x)

        # ---- decoder ----
        out_dim = cfg.gnn_feats_dim
        for i in range(cfg.num_layers - 1):
            layer = cfg.num_layers - 1 - i  # coarse -> fine
            out_dim //= 2
            x = jax.vmap(kpconv_ops.closest_pool)(x, pyr.upsamples[layer - 1])
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            if i < cfg.num_layers - 2:
                x = UnaryBlock(out_dim, name=f"dec_unary_{i}")(x, pyr.masks[layer - 1])
            else:
                # last_unary: bare linear to final_feats_dim + 2
                # (`kpconv_blocks.py:400,522-545`).
                x = nn.Dense(
                    cfg.final_feats_dim + 2, use_bias=False, name="last_unary"
                )(x)

        feats = x[..., : cfg.final_feats_dim]
        if cfg.normalize_output:
            # NaN-safe L2 normalize: padded rows are exactly zero (bias-free
            # last_unary on zeroed inputs) and d||x||/dx at 0 is NaN even
            # under jnp.maximum (0*inf); clamping the *squared* norm keeps
            # the backward finite so the mask below can zero it.
            sq = jnp.sum(jnp.square(feats), axis=-1, keepdims=True)
            feats = feats * jax.lax.rsqrt(jnp.maximum(sq, 1e-16))
        return feats * pyr.masks[0][..., None]
