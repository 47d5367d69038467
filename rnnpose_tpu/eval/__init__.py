"""Evaluation: pose metrics, per-class evaluators, ICP refinement."""
from .evaluator import PoseEvaluator, SYMMETRIC_CLASSES, YCBEvaluator  # noqa: F401
from .icp import icp_refine  # noqa: F401
