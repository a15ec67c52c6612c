"""Process-level TPU environment knobs (must run before JAX touches a device).

Call ensure_tpu_flags() at the top of any entry point that runs the big
kernels (bench.py, the CLI, exp/ scripts). It

  * leaves the XLA:TPU scoped-vmem budget at its DEFAULT. Round 2 raised
    it to 96 MB for an 8192-lane kernel layout that no longer exists; at
    that budget XLA:TPU generates fused fixed-base/normalize programs
    whose VMEM use faults the TPU worker (reproduced deterministically on
    the G2 fixed-base at m=27k — BENCH_r02's crash). The current Pallas
    kernels (M1=1024 lanes, lw2=128) fit comfortably in the default 16 MB.
  * leaves ZOKRATES_TPU_UNROLL at 1: the 16x-unrolled limb scans multiply
    every XLA EC program's compile time ~5-10x (25+ min for the sorted-MSM
    graph through the axon tunnel) for no measured steady-state win on the
    current, Pallas-dominated hot path.
  * enables the persistent compilation cache: prover executables take
    minutes of XLA/Mosaic compile on first use; cache them across
    processes. The env var alone is not reliably picked up by the axon
    PJRT plugin — set jax.config explicitly.
"""

from __future__ import annotations

import os

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu"
)


def ensure_tpu_flags() -> None:
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
