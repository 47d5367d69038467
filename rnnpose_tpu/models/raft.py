"""RAFT building blocks in flax (NHWC, TPU-native).

Re-implementation of the reference's `thirdparty/raft/extractor.py:118-232`
(BasicEncoder), `thirdparty/raft/update.py:6-60,79-97,164-188` (FlowHead,
SepConvGRU, BasicMotionEncoder, BasicUpdateBlock) with identical tensor
semantics so released torch checkpoints can be converted key-for-key
(`models/convert.py`). Channel-last layout throughout; instance norm is
GroupNorm(groups=C) without affine params, matching torch's
`InstanceNorm2d(affine=False)`.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "InstanceNorm",
    "ResidualBlock",
    "BasicEncoder",
    "FlowHead",
    "SepConvGRU",
    "BasicMotionEncoder",
    "BasicUpdateBlock",
]


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False): per-sample, per-channel over H, W.

    Statistics are always computed in float32 (safe under bf16 activations)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
        var = jnp.var(x32, axis=(-3, -2), keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)


def _norm(norm_fn: str):
    if norm_fn == "instance":
        return InstanceNorm()
    if norm_fn == "none":
        return lambda x: x
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=8)
    raise ValueError(f"unsupported norm_fn {norm_fn!r}")


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    norm_fn: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # Explicit (1, 1) padding: torch's Conv2d(3x3, stride=2, padding=1)
        # pads symmetrically, while flax 'SAME' at stride 2 pads (0, 1) —
        # a one-pixel spatial shift that breaks converted-weight parity.
        y = nn.Conv(self.planes, (3, 3), strides=self.stride,
                    padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(x)
        y = _norm(self.norm_fn)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), dtype=self.dtype, name="conv2")(y)
        y = _norm(self.norm_fn)(y)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, dtype=self.dtype, name="downsample")(x)
            x = _norm(self.norm_fn)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Feature encoder: 1/8 resolution, `output_dim` channels.

    7x7 stride-2 stem + three 2-block residual stages (64/96/128, strides
    1/2/2) + 1x1 projection (reference `extractor.py:118-232`).
    """

    output_dim: int = 256
    norm_fn: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # torch pads the stride-2 7x7 stem (3, 3) on each side
        # (`extractor.py:135`); flax 'SAME' would pad (2, 3).
        x = nn.Conv(64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="conv1")(x)
        x = _norm(self.norm_fn)(x)
        x = nn.relu(x)
        for i, (planes, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = ResidualBlock(planes, stride, self.norm_fn, self.dtype, name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(planes, 1, self.norm_fn, self.dtype, name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)


class FlowHead(nn.Module):
    hidden_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden_dim, (3, 3), dtype=self.dtype, name="conv1")(x))
        return nn.Conv(2, (3, 3), dtype=self.dtype, name="conv2")(x)


class SepConvGRU(nn.Module):
    """Separable 1x5 / 5x1 ConvGRU (reference `update.py:33-60`)."""

    hidden_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, h, x):
        for axis, name in ((1, "h"), (0, "v")):
            ksize = (1, 5) if axis == 1 else (5, 1)
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, ksize, dtype=self.dtype, name=f"convz_{name}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, ksize, dtype=self.dtype, name=f"convr_{name}")(hx))
            rhx = jnp.concatenate([r * h, x], axis=-1)
            q = nn.tanh(nn.Conv(self.hidden_dim, ksize, dtype=self.dtype, name=f"convq_{name}")(rhx))
            h = (1 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """corr + flow -> 128-channel motion features (reference `update.py:79-97`)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), dtype=self.dtype, name="convc2")(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), dtype=self.dtype, name="convf1")(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), dtype=self.dtype, name="convf2")(flo))
        out = nn.relu(
            nn.Conv(128 - 2, (3, 3), dtype=self.dtype, name="conv")(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class BasicUpdateBlock(nn.Module):
    """One GRU update: motion enc + SepConvGRU + flow head + upsample-mask head
    (reference `update.py:164-188`). Returns (h, mask, delta_flow)."""

    hidden_dim: int = 128
    downsample_scale: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, h, inp, corr, flow):
        motion = BasicMotionEncoder(self.dtype, name="encoder")(flow, corr)
        x = jnp.concatenate([inp.astype(motion.dtype), motion], axis=-1)
        h = SepConvGRU(self.hidden_dim, self.dtype, name="gru")(h, x)
        delta_flow = FlowHead(256, self.dtype, name="flow_head")(h)
        m = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype, name="mask1")(h))
        s = self.downsample_scale
        mask = 0.25 * nn.Conv(s * s * 9, (1, 1), dtype=self.dtype, name="mask2")(m)
        # Flow deltas and upsample logits return to f32: the LM solve and the
        # convex combination are precision-sensitive (the reference's AMP
        # casts back at the autocast boundary too).
        return h, mask.astype(jnp.float32), delta_flow.astype(jnp.float32)
