"""Correspondence-field (flow) network components.

Functional re-design of the reference `model/CFNet.py`:
  * `ImageFeaEncoder` (`CFNet.py:24-47`): RAFT BasicEncoder over both images,
    inputs normalized to [-1, 1]. The reference concatenates the two images
    into one batch for a single encoder pass — same here.
  * `GRU_CFUpdator` (`CFNet.py:50-173`) kept its correlation pyramid, context
    split and GRU hidden state as *module state* mutated across calls
    (`self.corr_fn/self.net/self.inp`, lines 115-133). Here that state is an
    explicit value threaded through the PoseRefiner's `lax.scan` carry
    (`models/refiner.py`), and this module only provides the pure pieces:
    context splitting and a single GRU flow step.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import corr as corr_ops
from ..ops.upsample import convex_upsample
from .raft import BasicEncoder, BasicUpdateBlock

__all__ = [
    "ImageFeaEncoder",
    "GRUFlowStep",
    "split_context",
    "downsample_flow",
    "resize_bilinear_ac",
]


class ImageFeaEncoder(nn.Module):
    """Encode both crop images to 1/8-res 256-d feature maps.

    `dtype=bfloat16` is the TPU analog of the reference's AMP autocast around
    the encoder (`CFNet.py:44-46`, enabled unconditionally there).
    """

    output_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray):
        # Images arrive in [0, 1]; RAFT normalization is 2x-1
        # (reference `CFNet.py:39-40` does 2*(x/255)-1 on byte-range images).
        x = jnp.concatenate([img1, img2], axis=0)
        x = 2.0 * x - 1.0
        fmap = BasicEncoder(
            self.output_dim, norm_fn="instance", dtype=self.dtype, name="fnet"
        )(x)
        b = img1.shape[0]
        return fmap[:b], fmap[b:]


def split_context(
    cfea: jnp.ndarray, hidden_dim: int = 128, context_dim: int = 128,
    dtype=None, out_hw=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rendered 3D context features -> initial GRU hidden + input.

    Downsample to 1/8 (no-op if `cfea` is already at the coarse resolution),
    split channels [hidden | context], tanh/relu (reference
    `CFNet.py:124-133`). `dtype` casts the GRU state/input for
    mixed-precision recurrence.
    """
    b, h, w, c = cfea.shape
    assert c >= hidden_dim + context_dim, f"context features too thin: {c}"
    if out_hw is None:
        out_hw = (h // 8, w // 8)
    if (h, w) != tuple(out_hw):
        lr = resize_bilinear_ac(cfea, out_hw)
    else:
        lr = cfea
    net = jnp.tanh(lr[..., :hidden_dim])
    inp = nn.relu(lr[..., hidden_dim : hidden_dim + context_dim])
    if dtype is not None:
        net = net.astype(dtype)
        inp = inp.astype(dtype)
    return net, inp


def resize_bilinear_ac(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize with torch's align_corners=True convention:
    source coordinate of output pixel i is i*(in-1)/(out-1).

    `jax.image.resize(..., 'bilinear')` uses the half-pixel convention, which
    differs from the reference's `F.interpolate(..., align_corners=True)`
    calls (`CFNet.py:129,143`). Implemented as two separable tent-weight
    matmuls (MXU-friendly, like `ops/sampler.separable_crop_sample`).
    """
    b, h, w, c = x.shape
    oh, ow = out_hw

    def weights(n_out, n_in):
        if n_out == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = jnp.arange(n_out, dtype=jnp.float32) * (
                (n_in - 1) / (n_out - 1)
            )
        return jnp.maximum(
            0.0, 1.0 - jnp.abs(src[:, None] - jnp.arange(n_in, dtype=jnp.float32))
        ).astype(x.dtype)

    wy = weights(oh, h)  # (oh, h)
    wx = weights(ow, w)  # (ow, w)
    hp = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("iy,byxc->bixc", wy, x, precision=hp)
    return jnp.einsum("jx,bixc->bijc", wx, tmp, precision=hp)


def downsample_flow(flow: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Full-res flow -> 1/factor res with magnitude rescale.

    Reference `CFNet.py:139-144`: `flow_init /= ds` then
    `F.interpolate(scale_factor=1/ds, mode='bilinear', align_corners=True)`.
    """
    b, h, w, c = flow.shape
    return resize_bilinear_ac(flow / factor, (h // factor, w // factor))


class GRUFlowStep(nn.Module):
    """One recurrent flow update at 1/8 res + convex upsampling to full res.

    corr lookup -> BasicUpdateBlock -> coords += delta -> upsample
    (reference `CFNet.py:146-168` with iters=1 per call). `dtype=bfloat16`
    mirrors the reference's `mixed_precision: True` autocast around the
    update block (`CFNet.py:126,152`, `template_fw0.5.yml:88`); the flow
    delta and upsample come back in f32 for the LM solve.
    """

    corr_radius: int = 4
    dtype: Any = None
    emit_full_flow: bool = True
    corr_impl: str = "mulreduce"   # corr_lookup lowering; see ops/corr.py

    @nn.compact
    def __call__(self, h, inp, pyramid: corr_ops.CorrPyramid, coords_lr, grid_lr):
        corr_feats = corr_ops.corr_lookup(
            pyramid, coords_lr, self.corr_radius, impl=self.corr_impl
        )
        flow_lr = coords_lr - grid_lr
        h, mask, delta = BasicUpdateBlock(dtype=self.dtype, name="update_block")(
            h, inp, corr_feats, flow_lr
        )
        coords_lr = coords_lr + delta
        if self.emit_full_flow:
            flow_up = convex_upsample(coords_lr - grid_lr, mask, factor=8)
        else:
            # Inference with the 1/8 LM never consumes the full-res flow;
            # return the coarse flow (histories stay cheap).
            flow_up = coords_lr - grid_lr
        return h, coords_lr, flow_up
