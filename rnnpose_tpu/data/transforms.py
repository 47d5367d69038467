"""RGB augmentation (reference `data/transforms.py:81-99`).

Train: RandomBlur(p=0.5, sigma in {3,5,7,9}) + ColorJitter(brightness 0.1,
contrast 0.1, saturation 0.05, hue 0.05); eval: identity. Pure numpy/PIL —
runs in the host input pipeline.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

__all__ = ["make_transforms", "random_blur", "color_jitter"]


def random_blur(img: np.ndarray, rs: np.random.RandomState, p: float = 0.5) -> np.ndarray:
    """Gaussian blur with kernel size sampled from {3,5,7,9} w.p. p."""
    if rs.rand() >= p:
        return img
    try:
        import cv2  # noqa: PLC0415

        k = int(rs.choice([3, 5, 7, 9]))
        return cv2.GaussianBlur(img, (k, k), 0)
    except ImportError:
        # numpy separable box-blur fallback
        k = int(rs.choice([3, 5, 7, 9]))
        pad = k // 2
        out = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
        kernel = np.ones(k) / k
        out = np.apply_along_axis(
            lambda m: np.convolve(m, kernel, mode="valid"), 0, out
        )
        out = np.apply_along_axis(
            lambda m: np.convolve(m, kernel, mode="valid"), 1, out
        )
        return out.astype(img.dtype)


def color_jitter(
    img: np.ndarray,
    rs: np.random.RandomState,
    brightness: float = 0.1,
    contrast: float = 0.1,
    saturation: float = 0.05,
    hue: float = 0.05,
) -> np.ndarray:
    """Torchvision-style jitter on a float [0,1] HWC image."""
    out = img.astype(np.float32)
    out = out * rs.uniform(1 - brightness, 1 + brightness)
    mean = out.mean()
    out = (out - mean) * rs.uniform(1 - contrast, 1 + contrast) + mean
    gray = out.mean(axis=-1, keepdims=True)
    out = gray + (out - gray) * rs.uniform(1 - saturation, 1 + saturation)
    # cheap hue shift: rotate channels toward each other
    h = rs.uniform(-hue, hue)
    out = out + h * (np.roll(out, 1, axis=-1) - out)
    return np.clip(out, 0.0, 1.0)


def make_transforms(is_train: bool, seed: int = 0) -> Callable[..., np.ndarray]:
    """Compose like the reference `make_transforms`.

    The returned callable takes `(img, rs=None)`. With `rs=None` it draws
    from an internal stream seeded at construction (reference semantics —
    augmentation depends on call history). Passing an explicit per-sample
    `rs` makes the augmentation a pure function of that RNG — required for
    thread-safe prefetching and bit-reproducible `--resume` (the trainer
    derives one RNG per (seed, sample position); see
    `LinemodSynRealDataset.sample_at`).
    """
    rs_default = np.random.RandomState(seed)
    if not is_train:
        return lambda img, rs=None: img

    def apply(img, rs=None):
        rs = rs_default if rs is None else rs
        img = random_blur(img, rs)
        img = color_jitter(img, rs)
        return img

    return apply
