"""TPU benchmark: sorted-MSM throughput at 2^16..2^22, full-width scalars.

Generates N distinct random-looking points ON DEVICE (P_i = R0 + i*Q via
the fixed-base kernel) so setup takes seconds, then times the sorted MSM.
Usage: python exp/bench_sorted.py [log2_n ...]
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, "/root/repo")
from zokrates_tpu.tpu_env import ensure_tpu_flags
ensure_tpu_flags()

import jax
import jax.numpy as jnp
import numpy as np

from zokrates_tpu.ec.curve import g1_group
from zokrates_tpu.fields.jfield import field_ops
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
from zokrates_tpu.kernels import msm_sorted as M
from zokrates_tpu.kernels.fixed_base import batch_normalize, fixed_base_for

def gen_points(curve, n, seed=7):
    """(N, 128) packed device points P_i = R0 + i*Q, distinct, random-looking."""
    grp = g1_group(curve)
    rng = np.random.RandomState(seed)
    r0 = int.from_bytes(rng.bytes(32), "big") % grp.r
    q0 = int.from_bytes(rng.bytes(32), "big") % grp.r
    # scalars s_i = r0 + i*q0 mod r -> P_i = s_i * G, all distinct
    scalars = [(r0 + i * q0) % grp.r for i in range(n)]
    fb = fixed_base_for(curve, "g1")
    S = jnp.asarray(ints_to_limbs(scalars, n_limbs(grp.r)))
    ax, ay, inf = fb.to_affine(S)
    assert not bool(jnp.any(inf))
    return M.pack_points(grp.q, ax, ay)

def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16, 18, 20]
    grp = g1_group("bn128")
    rng = np.random.RandomState(11)
    for lg in sizes:
        n = 1 << lg
        t0 = time.perf_counter()
        P128 = gen_points("bn128", n)
        P128.block_until_ready()
        print(f"2^{lg}: points generated in {time.perf_counter()-t0:.1f}s", flush=True)
        scalars = [int.from_bytes(rng.bytes(32), "big") % grp.r for i in range(n)]
        S = jnp.asarray(ints_to_limbs(scalars, n_limbs(grp.r)))
        cfg = M.default_config(n)
        t0 = time.perf_counter()
        res = M.msm_sorted_host(grp.q, grp.r, P128, S, cfg)
        print(f"2^{lg}: first call (compile) {time.perf_counter()-t0:.1f}s", flush=True)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            res = M.msm_sorted_host(grp.q, grp.r, P128, S, cfg)
        dt = (time.perf_counter() - t0) / iters
        print(f"2^{lg}: {dt*1e3:.1f} ms -> {n/dt/1e6:.3f} M points/s  (vs 5M/s CPU anchor: {n/dt/5e6:.3f}x)", flush=True)

if __name__ == "__main__":
    main()
