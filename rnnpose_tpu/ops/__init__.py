"""Compute ops: sampling, correlation, upsampling, KPConv, KNN, FPS, kernels."""
from . import corr, fps, kernel_points, knn, kpconv_ops, sampler, upsample  # noqa: F401
