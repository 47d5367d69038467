"""Geometry core: SE(3) Lie math, projective ops, LM pose optimization, crops."""
from . import se3, projective, lm, crop, intrinsics  # noqa: F401
