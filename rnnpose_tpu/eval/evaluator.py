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

__all__ = ["SYMMETRIC_CLASSES", "PoseEvaluator"]

SYMMETRIC_CLASSES = ("eggbox", "glue")  # reference `utils/eval_metric.py:329-336`


@dataclasses.dataclass
class PoseEvaluator:
    """Accumulates pose metrics for ONE object class.

    Args:
      class_name: object class (selects ADD vs ADD-S).
      diameter: object diameter in the model unit (reference uses cm/100).
      model_points: (N, 3) model points for ADD computation.
      point_valid: optional (N,) validity mask for padded points.
      icp_refine: placeholder for the reference's dormant ICP hook
        (`eval_metric.py:99-100,201-259`), unsupported.
    """

    class_name: str
    diameter: float
    model_points: np.ndarray
    point_valid: Optional[np.ndarray] = None
    icp_refine: bool = False

    def __post_init__(self):
        if self.icp_refine:
            raise NotImplementedError("ICP refinement is dormant in the reference too")
        self.symmetric = self.class_name in SYMMETRIC_CLASSES
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

    def evaluate(self, T_pred: np.ndarray, T_gt: np.ndarray, K: np.ndarray):
        """Accumulate one (batched) prediction. T_*: (B, 4, 4), K: (B, 4)."""
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
