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

# The full suite JIT-compiles ~500 XLA:CPU executables in one process; each
# contributes dozens of mmaps and the process crosses the default
# vm.max_map_count (65530) around the 400th test, after which mmap failures
# surface as segfaults/aborts inside LLVM. Raise it (root-only; best-effort).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1_000_000:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("4000000")
except (OSError, PermissionError, ValueError):
    pass

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache (jax_compilation_cache_dir) is
# deliberately NOT enabled: on this runner XLA:CPU serializes AOT results
# with machine features the loader then rejects ("+prefer-no-scatter is not
# supported on the host machine"), and deserializing such an entry can
# segfault inside get_executable_and_time. Cold compiles are slower but
# reliable.

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0x5EED)
