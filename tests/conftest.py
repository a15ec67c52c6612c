"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py outside pytest; tests validate
numerics and multi-device sharding on the host platform (the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

Note: the axon TPU plugin ignores JAX_PLATFORMS, so we force CPU through
jax.config before any device is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: XLA:CPU compiles of the limb kernels are
# expensive (~10s); cache them across pytest runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0x5EED)
