"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the TPU analog of multi-node-simulation-without-a-cluster: pjit /
shard_map logic is exercised on 8 virtual CPU devices
(SURVEY.md §4 'Implication for the new framework').
"""
import os

# Must be set before the CPU client initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize registers a remote TPU ('axon') PJRT plugin and
# force-selects jax_platforms='axon,cpu', overriding the env var — which
# routes every op through a network relay with multi-second remote compiles.
# Tests must run on the local virtual-8-device CPU backend, so force it back.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the composed-CLI tests (resume equivalence,
# e2e) build the same trainer executable several times per test; caching
# turns repeat compiles (~minutes each on this 1-core box) into loads.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_rnnpose_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
