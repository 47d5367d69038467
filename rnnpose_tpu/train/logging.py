"""Training logging.

Re-design of the reference `SimpleModelLog` (`utils/log_tool.py:46-152`):
plain-text `log.txt`, JSON-lines `log.json.lst`, and TensorBoard event files
(via flax's pure-python `tensorboard` SummaryWriter when available, else the
JSON-lines file stands alone). Rank-0-only gating mirrors `disable`
(`tools/train.py:517`) via `jax.process_index()`.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["ModelLog"]


class ModelLog:
    def __init__(self, model_dir: str, disable: Optional[bool] = None):
        self.model_dir = model_dir
        self.disable = (
            disable if disable is not None else jax.process_index() != 0
        )
        self._txt = None
        self._jsonl = None
        self._tb = None
        if not self.disable:
            os.makedirs(model_dir, exist_ok=True)
            self._txt = open(os.path.join(model_dir, "log.txt"), "a")
            self._jsonl = open(os.path.join(model_dir, "log.json.lst"), "a")
            try:
                from flax.metrics import tensorboard  # noqa: PLC0415

                self._tb = tensorboard.SummaryWriter(
                    os.path.join(model_dir, "summary")
                )
            except Exception:
                self._tb = None

    def log_text(self, text: str, step: int):
        if self.disable:
            return
        line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] step {step}: {text}"
        print(line, flush=True)
        self._txt.write(line + "\n")
        self._txt.flush()

    def log_metrics(self, metrics: Dict[str, Any], step: int):
        if self.disable:
            return
        clean = {
            k: float(np.asarray(v)) if not isinstance(v, str) else v
            for k, v in metrics.items()
        }
        rec = {"step": step, **clean}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in clean.items():
                if isinstance(v, float):
                    self._tb.scalar(k, v, step)
        self.log_text(
            " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in clean.items()
            ),
            step,
        )

    def log_images(self, images: Dict[str, Any], step: int):
        """TensorBoard image summaries (reference logs flow/weight/render
        visualizations, `tools/train.py:617-626`)."""
        if self.disable or self._tb is None:
            return
        for k, v in images.items():
            arr = np.asarray(v)
            if arr.ndim == 4:
                arr = arr[0]
            self._tb.image(k, np.clip(arr, 0, 1), step)

    def close(self):
        for h in (self._txt, self._jsonl):
            if h is not None:
                h.close()
        if self._tb is not None:
            self._tb.flush()
