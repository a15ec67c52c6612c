"""Process-level TPU environment knobs (must run before JAX touches a device).

The 8192-lane (S=64 sublane) Pallas walk/suffix kernels use ~26 MB of
VMEM blocks per step; XLA:TPU's default scoped-vmem budget is 16 MB, so
without this flag Mosaic compilation fails with a scoped-vmem stack OOM.
v5e has 128 MB of VMEM — raise the budget to 96 MB. The axon plugin
snapshots the environment at first device use, so call ensure_tpu_flags()
at the top of any entry point that runs the big kernels (bench.py, the
CLI, exp/ scripts).
"""

from __future__ import annotations

import os

_FLAG = "--xla_tpu_scoped_vmem_limit_kib=98304"


_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tpu")


def ensure_tpu_flags() -> None:
    # xla_tpu_* are libtpu flags, not host XLA_FLAGS
    args = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in args:
        os.environ["LIBTPU_INIT_ARGS"] = (args + " " + _FLAG).strip()
    os.environ.setdefault("ZOKRATES_TPU_UNROLL", "16")

    # Persistent compilation cache: prover executables (fixed-base setup,
    # h-stage, Mosaic MSM) take minutes of XLA/Mosaic compile on first use;
    # cache them across processes. The env var alone is not reliably picked
    # up by the axon PJRT plugin — set jax.config explicitly.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
