"""SPMD: device mesh, shardings, metric collectives."""
from .mesh import make_mesh, shard_batch, replicate_params, data_sharding, replicated  # noqa: F401
