"""Probe: does the G2 sorted-MSM fold kernel compile/run under a raised
scoped-vmem budget at the bench shape (N=2^15, c=8)?  Usage:
  python exp/g2_vmem_probe.py [vmem_kib]
"""
import os, sys, time

if len(sys.argv) > 1 and sys.argv[1] != "0":
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + f" --xla_tpu_scoped_vmem_limit_kib={sys.argv[1]}"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, "/root/repo")
from zokrates_tpu.tpu_env import ensure_tpu_flags
ensure_tpu_flags()

import jax
import jax.numpy as jnp
import numpy as np

from zokrates_tpu.ec.curve import g2_group
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
from zokrates_tpu.kernels import msm_sorted as M
from zokrates_tpu.kernels.fixed_base import fixed_base_for

curve = "bn128"
n = 1 << 15
grp = g2_group(curve)
rng = np.random.RandomState(3)
scalars_pt = [(5 + 9 * i) % grp.r for i in range(n)]
fb = fixed_base_for(curve, "g2")
S0 = jnp.asarray(ints_to_limbs(scalars_pt, n_limbs(grp.r)))
ax, ay, inf = fb.to_affine(S0)
assert not bool(jnp.any(inf))
P128 = M.pack_points_g2(grp.q, ax, ay)
print("points ready", flush=True)

sc = [int.from_bytes(rng.bytes(32), "big") % grp.r for i in range(n)]
S = jnp.asarray(ints_to_limbs(sc, n_limbs(grp.r)))
beta = grp.tower.beta - grp.q
cfg = M.default_config(n)
t0 = time.perf_counter()
res = M.msm_sorted_host(grp.q, grp.r, P128, S, cfg, beta=beta)
print(f"first call {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
iters = 3
for _ in range(iters):
    res = M.msm_sorted_host(grp.q, grp.r, P128, S, cfg, beta=beta)
dt = (time.perf_counter() - t0) / iters
print(f"g2 msm 2^15: {dt*1e3:.1f} ms", flush=True)

# correctness vs host: sum s_i * P_i where P_i = (5+9i)G2
acc_s = sum(s * p for s, p in zip(sc, scalars_pt)) % grp.r
exp_pt = grp.generator() * acc_s
from zokrates_tpu.ec.tower import Fq2
jx, jy, jz = res
zf = Fq2(grp.tower, jz[0], jz[1])
zi = zf.inv()
zi2 = zi * zi
xf = Fq2(grp.tower, jx[0], jx[1]) * zi2
yf = Fq2(grp.tower, jy[0], jy[1]) * zi2 * zi
assert (xf.c0, xf.c1) == (exp_pt.x.c0, exp_pt.x.c1), "X mismatch"
assert (yf.c0, yf.c1) == (exp_pt.y.c0, exp_pt.y.c1), "Y mismatch"
print("OK correct", flush=True)
