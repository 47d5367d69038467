"""Evaluation: pose metrics and the per-class evaluator."""
from .evaluator import PoseEvaluator, SYMMETRIC_CLASSES  # noqa: F401
