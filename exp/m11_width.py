"""Probe: walk-kernel throughput vs lane width M (adds/sec).

If the mixed-add is instruction-issue-bound, doubling M doubles adds/sec
for the same wall time; if data-bound, adds/sec is flat.
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from zokrates_tpu.kernels import msm_sorted as MS
from zokrates_tpu.fields.params import BASE_FIELDS

p = BASE_FIELDS["bn128"].p
nl = 16
rng = np.random.default_rng(1)

TOTAL = 1 << 21  # adds per variant


def bench(M, R):
    T = TOTAL // (M * R)
    call = MS._walk_call(p, R, M, T, "mixed", False, False)
    q = jnp.asarray(rng.integers(0, 1 << 16, (T * R, 2 * nl, M), dtype=np.uint32))
    f = jnp.zeros((T, R, M), jnp.uint32)  # no flush, no skip
    t0 = time.perf_counter()
    o, c = call(q, f)
    jax.device_get(c)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        o, c = call(q, f)
        jax.device_get(c)
    dt = (time.perf_counter() - t0) / 3
    print(
        f"M={M:5d} R={R} T={T:4d}: {dt*1e3:7.1f}ms compile={tc:.0f}s -> "
        f"{TOTAL/dt/1e6:6.1f} M adds/s",
        flush=True,
    )


for M, R in [(1024, 4), (2048, 4), (4096, 4), (8192, 4), (4096, 8), (1024, 16)]:
    bench(M, R)
