"""Per-class pose evaluator (LINEMOD protocol).

Re-design of the reference `LineMODEvaluator` (`utils/eval_metric.py:59-356`):
per-class accumulation of ADD(-S) at 0.1/0.05/0.02 x diameter, Proj2D@5px,
5cm5deg, plus angular/translation error summaries; `summarize()` returns the
means and the sequence length (used for the distributed seq_len-weighted
reduction, `tools/train.py:724-741` — here a plain weighted average over
`psum`-style gathered partials, `parallel/collectives.py`).

Symmetric classes (eggbox, glue) use ADD-S (`eval_metric.py:329-336`).
Metric kernels run jitted on device (`eval/metrics.py`); the accumulator is
host-side Python like the reference's.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics as M

__all__ = ["SYMMETRIC_CLASSES", "PoseEvaluator", "YCBEvaluator"]

SYMMETRIC_CLASSES = ("eggbox", "glue")  # reference `utils/eval_metric.py:329-336`


@dataclasses.dataclass
class PoseEvaluator:
    """Accumulates pose metrics for ONE object class.

    Args:
      class_name: object class (selects ADD vs ADD-S).
      diameter: object diameter in the model unit (reference uses cm/100).
      model_points: (N, 3) model points for ADD computation.
      point_valid: optional (N,) validity mask for padded points.
      icp_refine: run TPU-native trimmed ICP (`eval/icp.py`) against the
        depth-lifted scene cloud before computing metrics — the working
        equivalent of the reference's dormant Open3D hook
        (`eval_metric.py:99-100,201-259`). Requires `scene_points` to be
        passed to `evaluate`.
    """

    class_name: str
    diameter: float
    model_points: np.ndarray
    point_valid: Optional[np.ndarray] = None
    icp_refine: bool = False
    icp_iters: int = 10
    icp_max_corr_dist: float = 0.02
    symmetric_override: Optional[bool] = None  # None -> by class table

    def __post_init__(self):
        self.symmetric = (
            self.symmetric_override
            if self.symmetric_override is not None
            else self.class_name in SYMMETRIC_CLASSES
        )
        self._records: List[Dict[str, float]] = []
        pts = jnp.asarray(self.model_points)[None]
        vv = (
            jnp.asarray(self.point_valid)[None]
            if self.point_valid is not None
            else None
        )

        @jax.jit
        def _compute(T_pred, T_gt, K):
            Rp, tp = T_pred[:, :3, :3], T_pred[:, :3, 3]
            Rg, tg = T_gt[:, :3, :3], T_gt[:, :3, 3]
            add = M.add_error(Rp, tp, Rg, tg, pts, vv)
            adds = M.adds_error(Rp, tp, Rg, tg, pts, vv)
            proj = M.projection_2d_error(Rp, tp, Rg, tg, pts, K, vv)
            terr = M.translation_error(tp, tg)
            rerr = M.rotation_error_deg(Rp, Rg)
            return add, adds, proj, terr, rerr

        self._compute = _compute

    def evaluate(
        self,
        T_pred: np.ndarray,
        T_gt: np.ndarray,
        K: np.ndarray,
        scene_points: Optional[np.ndarray] = None,
        scene_valid: Optional[np.ndarray] = None,
    ):
        """Accumulate one (batched) prediction. T_*: (B, 4, 4), K: (B, 4).

        scene_points: (B, M, 3) camera-frame depth-lifted points — consumed
        only with `icp_refine=True`."""
        if self.icp_refine:
            if scene_points is None:
                raise ValueError("icp_refine=True needs scene_points")
            from .icp import icp_refine

            T_pred = np.asarray(
                icp_refine(
                    jnp.asarray(T_pred),
                    jnp.broadcast_to(
                        jnp.asarray(self.model_points)[None],
                        (len(T_pred),) + self.model_points.shape,
                    ),
                    jnp.asarray(scene_points),
                    model_valid=(
                        jnp.broadcast_to(
                            jnp.asarray(self.point_valid)[None],
                            (len(T_pred),) + self.point_valid.shape,
                        )
                        if self.point_valid is not None
                        else None
                    ),
                    scene_valid=(
                        jnp.asarray(scene_valid)
                        if scene_valid is not None
                        else None
                    ),
                    num_iters=self.icp_iters,
                    max_corr_dist=self.icp_max_corr_dist,
                )
            )
        add, adds, proj, terr, rerr = map(
            np.asarray,
            self._compute(jnp.asarray(T_pred), jnp.asarray(T_gt), jnp.asarray(K)),
        )
        used = adds if self.symmetric else add
        for b in range(len(used)):
            d = float(used[b])
            self._records.append(
                {
                    "add01": float(d < 0.1 * self.diameter),
                    "add005": float(d < 0.05 * self.diameter),
                    "add002": float(d < 0.02 * self.diameter),
                    "proj5": float(proj[b] < 5.0),
                    "cm5deg5": float((terr[b] < 0.05) & (rerr[b] < 5.0)),
                    "trans_err": float(terr[b]),
                    "rot_err_deg": float(rerr[b]),
                    "add_dist": d,
                    "add_dist_raw": float(add[b]),
                    "adds_dist_raw": float(adds[b]),
                }
            )

    def summarize(self) -> Dict[str, float]:
        """Means + seq_len (reference `eval_metric.py:261-302`)."""
        n = len(self._records)
        if n == 0:
            return {"seq_len": 0}
        out = {
            k: float(np.mean([r[k] for r in self._records]))
            for k in self._records[0]
        }
        out["seq_len"] = n
        return out

    def reset(self):
        self._records.clear()


@dataclasses.dataclass
class YCBEvaluator(PoseEvaluator):
    """YCB-Video protocol on top of `PoseEvaluator`.

    The reference ships the BOP-YCB class tables (`data/ycb/basic.py:2-26`)
    but its `YCBEvaluator` is commented out (`utils/eval_metric.py:361+`);
    this is the working equivalent. Differences from LINEMOD:

      * symmetric set = the five YCB symmetric objects (`data/ycb.py`);
      * `summarize()` adds the community-standard PoseCNN AUC metrics —
        area under the accuracy/threshold curve for thresholds 0..0.1 m,
        which per sample is clip(1 - d / 0.1, 0, 1) — for both ADD and
        ADD-S, plus ADD-S < 2 cm.
    """

    auc_max_m: float = 0.1

    def __post_init__(self):
        from ..data.ycb import YCB_SYMMETRIC

        if self.symmetric_override is None:
            self.symmetric_override = self.class_name in YCB_SYMMETRIC
        super().__post_init__()

    def summarize(self) -> Dict[str, float]:
        out = super().summarize()
        if not self._records:
            return out
        add = np.asarray([r["add_dist_raw"] for r in self._records])
        adds = np.asarray([r["adds_dist_raw"] for r in self._records])
        out["add_auc"] = float(
            np.mean(np.clip(1.0 - add / self.auc_max_m, 0.0, 1.0))
        )
        out["adds_auc"] = float(
            np.mean(np.clip(1.0 - adds / self.auc_max_m, 0.0, 1.0))
        )
        out["adds2cm"] = float(np.mean(adds < 0.02))
        return out
