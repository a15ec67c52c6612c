"""Benchmark: Groth16 hot-kernel throughput on the real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures steady-state Pippenger MSM throughput (BN254 G1, 2^16 points)
through the Pallas accumulation kernel (kernels/pallas_field.py) — the
kernel that dominates Groth16 proving time. The ~30s first-call Mosaic
compile is excluded (warmup); steady state is averaged over 3 runs.

vs_baseline anchors against 5.0e6 points/s, an order-of-magnitude figure
for arkworks' parallel bn254 G1 MSM at this size on a modern 16-core host
(the reference publishes no numbers — BASELINE.md).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

import numpy as np

BASELINE_POINTS_PER_S = 5.0e6
N_LOG2 = 16


def main():
    import jax
    import jax.numpy as jnp

    from zokrates_tpu.ec.curve import g1_group
    from zokrates_tpu.fields.jfield import field_ops
    from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
    from zokrates_tpu.kernels.msm_pallas import msm_pallas

    n = 1 << N_LOG2
    grp = g1_group("bn128")
    f = field_ops(grp.q)

    # n random-looking points: P_i = R0 + i*Q with random 254-bit R0, Q.
    # (Small-multiple families like i*g are pathological: bucket partial
    # sums (a+b)*g literally equal other input points, constantly forcing
    # the kernel's complete-addition fallback. Real prover bases are
    # powers-of-tau images, where such collisions are negligible.)
    g = grp.generator()
    rng = np.random.RandomState(7)
    r0 = int.from_bytes(rng.bytes(32), "big") % grp.r
    q0 = int.from_bytes(rng.bytes(32), "big") % grp.r
    acc, step = g * r0, g * q0
    base = []
    for _ in range(n):
        base.append(acc)
        acc = acc + step
    scalars = [int(s) for s in rng.randint(1, 1 << 48, size=n, dtype=np.int64)]

    Px = f.encode([p.x for p in base])
    Py = f.encode([p.y for p in base])
    S = jnp.asarray(ints_to_limbs(scalars, n_limbs(grp.r)))

    # warmup / compile
    msm_pallas(grp.q, grp.r, Px, Py, S)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        msm_pallas(grp.q, grp.r, Px, Py, S)
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
