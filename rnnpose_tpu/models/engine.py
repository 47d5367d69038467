"""Inference engine: jitted forwards + per-class constant caching.

The reference caches per-class 3D descriptors/context features as module
state at eval (`model/RNNPose.py:169-176`, `model/HybridNet.py:91-95`).
Here the model stays pure; THIS object owns the mutable cache — one
`encode_3d` call per class, then every frame runs the cached-constant
forward. Used by `tools/eval.py`/`tools/demo.py`-style drivers and directly
embeddable in a serving loop.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .rnnpose import RNNPose, RNNPoseInputs

__all__ = ["InferenceEngine"]


class InferenceEngine:
    def __init__(self, model: RNNPose, params: Any):
        self.model = model
        self.params = params
        self._cache: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self._fwd = jax.jit(
            lambda p, x, d3, c3: model.apply(
                p, x, train=False, cached_desc3d=d3, cached_ctx3d=c3
            )
        )
        self._enc3d = jax.jit(
            lambda p, pyr: model.apply(p, pyr, method=RNNPose.encode_3d)
        )

    def class_features(self, class_name: str, pyramid):
        """3D descriptor + context features for a class, computed once."""
        if class_name not in self._cache:
            self._cache[class_name] = self._enc3d(self.params, pyramid)
        return self._cache[class_name]

    def refine(self, class_name: str, inputs: RNNPoseInputs) -> Dict[str, Any]:
        """Refine one batch of poses for `class_name`. Returns the model's
        inference outputs (Ti_pred etc.)."""
        desc3d, ctx3d = self.class_features(class_name, inputs.pyramid)
        return self._fwd(self.params, inputs, desc3d, ctx3d)

    def evict(self, class_name: Optional[str] = None):
        if class_name is None:
            self._cache.clear()
        else:
            self._cache.pop(class_name, None)
