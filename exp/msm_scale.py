"""Full-width-scalar G1 MSM throughput at 2^16..2^20 on TPU, with a
linearity correctness check at each size (points e_i*G from the device
fixed base, expected result (sum s_i e_i mod r)*G on the host)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
from zokrates_tpu.tpu_env import ensure_tpu_flags

ensure_tpu_flags()

import jax
import jax.numpy as jnp
import numpy as np

from zokrates_tpu.ec.curve import g1_group
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
from zokrates_tpu.kernels.fixed_base import fixed_base_for
from zokrates_tpu.kernels.msm_sorted import (
    default_config,
    msm_sorted_host,
    pack_points,
)

grp = g1_group("bn128")
q, r = grp.q, grp.r
nls = n_limbs(r)
G = grp.generator()
rng = np.random.default_rng(1)

sizes = [int(a) for a in (sys.argv[1:] or ["16", "18", "20"])]
for lg in sizes:
    N = 1 << lg
    # exponents in chunks to bound host bigint list building
    es = [int.from_bytes(rng.bytes(40), "little") % r for _ in range(N)]
    ss = [int.from_bytes(rng.bytes(40), "little") % r for _ in range(N)]
    fb = fixed_base_for("bn128", "g1")
    t0 = time.time()
    # fixed-base in 2^16 slices to bound device memory
    xs, ys = [], []
    step = 1 << 16
    for off in range(0, N, step):
        S_e = jnp.asarray(ints_to_limbs(es[off : off + step], nls))
        ax, ay, inf = fb.to_affine(S_e)
        xs.append(ax)
        ys.append(ay)
    X = jnp.concatenate(xs, axis=0)
    Y = jnp.concatenate(ys, axis=0)
    P128 = pack_points(q, X, Y)
    jax.block_until_ready(P128)
    print(f"2^{lg}: points built {time.time()-t0:.1f}s", flush=True)

    S = jnp.asarray(ints_to_limbs(ss, nls))
    cfg = default_config(N)
    t0 = time.time()
    jx, jy, jz = msm_sorted_host(q, r, P128, S, cfg)
    print(f"2^{lg}: first call (compile) {time.time()-t0:.1f}s cfg={cfg}", flush=True)

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        jx, jy, jz = msm_sorted_host(q, r, P128, S, cfg)
    dt = (time.time() - t0) / iters
    pts_per_s = N / dt
    print(f"2^{lg}: {dt*1e3:.1f} ms -> {pts_per_s/1e6:.2f} M points/s "
          f"(full 254-bit scalars)", flush=True)

    expect = G * (sum(s * e for s, e in zip(ss, es)) % r)
    zi = pow(jz, -1, q)
    got = (jx * zi * zi % q, jy * zi * zi % q * zi % q)
    ok = got == (expect.x, expect.y)
    print(f"2^{lg}: linearity {'PASS' if ok else 'FAIL'}", flush=True)
