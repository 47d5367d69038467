"""Data pipeline: datasets, preprocessing, pyramids, samplers, loaders."""
from .dataset import Dataset, register_dataset, get_dataset_class  # noqa: F401
