"""Benchmark: Groth16 hot-kernel throughput on the real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures steady-state Pippenger MSM throughput (BN254 G1, 2^16 points,
c=16) — the kernel that dominates Groth16 proving time (4 G1 MSMs + 1 G2
MSM per proof; reference counterpart is arkworks' multicore Pippenger).

vs_baseline anchors against 5.0e6 points/s, an order-of-magnitude figure
for arkworks' parallel bn254 G1 MSM at this size on a modern 16-core host
(the reference publishes no numbers — BASELINE.md; this anchor is replaced
by a measured CPU baseline when one can be run).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ.setdefault("ZOKRATES_TPU_UNROLL", "4")

import numpy as np

BASELINE_POINTS_PER_S = 5.0e6
N_LOG2 = 16
WINDOW_C = 8


def main():
    import jax
    import jax.numpy as jnp

    from zokrates_tpu.ec.curve import g1_group
    from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
    from zokrates_tpu.kernels.jec import curve_ops
    from zokrates_tpu.kernels.msm import combine_window_sums, msm_ws_jit

    dev = jax.devices()[0]
    n = 1 << N_LOG2
    grp = g1_group("bn128")
    ops = curve_ops(grp.q)

    # sample points: batch fixed-base ladder [s_i]G with 48-bit scalars on
    # device (valid curve points, cheap to generate)
    g = grp.generator()
    rng = np.random.RandomState(7)
    base_scalars = rng.randint(1, 1 << 48, size=n, dtype=np.int64)

    # host ladder for a few powers, then tile + offset to synthesize n
    # distinct points cheaply: P_i = [i mod 1024 + 1]G * ... keep it honest
    # but fast: use 1024 distinct host points repeated, scalars all distinct.
    base = []
    acc = g
    for _ in range(1024):
        base.append(acc)
        acc = acc + g
    xs = [base[i % 1024].x for i in range(n)]
    ys = [base[i % 1024].y for i in range(n)]
    Px = ops.f.encode(xs)
    Py = ops.f.encode(ys)
    nls = n_limbs(grp.r)
    scalars = [int(s) for s in base_scalars]
    S = jnp.asarray(ints_to_limbs(scalars, nls))

    fn = msm_ws_jit(ops, WINDOW_C)
    # warmup / compile
    res = fn(Px, Py, S)
    jax.block_until_ready(res)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        res = fn(Px, Py, S)
        jax.block_until_ready(res)
        affs = ops.to_affine_ints(res)
        _ = combine_window_sums(grp, affs, WINDOW_C)
    dt = (time.perf_counter() - t0) / iters

    pts_per_s = n / dt
    print(
        json.dumps(
            {
                "metric": f"msm_g1_bn254_2^{N_LOG2}_throughput",
                "value": round(pts_per_s, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_s / BASELINE_POINTS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
