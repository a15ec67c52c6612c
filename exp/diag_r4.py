"""Round-4 diagnostic: isolate the BENCH_r03 verify failure on TPU.

Steps (each prints PASS/FAIL):
  1. fixed_base G1 sanity: e_i*G on device vs host scalar-mult (sample).
  2. sorted-MSM G1 at N=2^15 (bench tier): linearity check
     sum(s_i * (e_i G)) == (sum s_i e_i mod r) G.
  3. sorted-MSM G2 at N=2^15 (beta path): same with G2 generator.
  4. small end-to-end groth16 setup/prove/verify on TPU.
"""

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

from zokrates_tpu.ec.curve import g1_group, g2_group
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs

CURVE = "bn128"
N = 1 << 15
rng = np.random.default_rng(0)

g1 = g1_group(CURVE)
g2 = g2_group(CURVE)
r = g1.r
q = g1.q
nls = n_limbs(r)

print(f"backend: {jax.default_backend()}", flush=True)


def rand_scalars(n):
    return [int.from_bytes(rng.bytes(40), "little") % r for _ in range(n)]


# ---- step 1+2: G1 fixed-base + sorted MSM ----
from zokrates_tpu.kernels.fixed_base import fixed_base_for

es = rand_scalars(N)
t0 = time.time()
fb = fixed_base_for(CURVE, "g1")
S_e = jnp.asarray(ints_to_limbs(es, nls))
ax, ay, inf = fb.to_affine(S_e)
jax.block_until_ready(ax)
print(f"fixed_base g1 done {time.time()-t0:.1f}s", flush=True)

from zokrates_tpu.fields.jfield import field_ops

f = field_ops(q)
ax_h = f.decode(ax)
ay_h = f.decode(ay)
inf_h = np.asarray(jax.device_get(inf))
G = g1.generator()
ok = True
for i in rng.integers(0, N, 6):
    i = int(i)
    expect = G * es[i]
    got = (ax_h[i], ay_h[i])
    if inf_h[i] or got != (expect.x, expect.y):
        ok = False
        print(f"  mismatch at {i}: {got} vs {(expect.x, expect.y)}")
# on-curve check for all
bad = 0
for i in range(0, N, 257):
    x, y = ax_h[i], ay_h[i]
    if (y * y - x * x * x - 3) % q != 0:
        bad += 1
print(f"step1 fixed_base_g1: {'PASS' if ok and bad == 0 else 'FAIL'} (offcurve={bad})", flush=True)

# ---- step 2: sorted MSM G1 ----
from zokrates_tpu.kernels.msm_sorted import default_config, msm_sorted_host, pack_points

ss = rand_scalars(N)
P128 = pack_points(q, ax, ay)
S = jnp.asarray(ints_to_limbs(ss, nls))
cfg = default_config(N, interpret=jax.default_backend() != "tpu")
print(f"cfg: {cfg}", flush=True)
t0 = time.time()
jx, jy, jz = msm_sorted_host(q, r, P128, S, cfg)
print(f"msm_sorted g1 done {time.time()-t0:.1f}s", flush=True)
expect_scalar = sum(s * e for s, e in zip(ss, es)) % r
expect = G * expect_scalar
if jz == 0:
    got = None
else:
    zi = pow(jz, -1, q)
    got = (jx * zi * zi % q, jy * zi * zi % q * zi % q)
ok2 = got == (expect.x, expect.y)
print(f"step2 msm_sorted_g1 N=2^15: {'PASS' if ok2 else 'FAIL'}", flush=True)
if not ok2:
    print(f"  got {got}\n  expect {(expect.x, expect.y)}")

# second call (steady state timing)
t0 = time.time()
jx, jy, jz = msm_sorted_host(q, r, P128, S, cfg)
print(f"msm_sorted g1 steady: {time.time()-t0*1:.3f}s".replace("-", " "), flush=True)
print(f"  steady wall: {time.time()-t0:.3f}s", flush=True)

# ---- step 3: G2 ----
from zokrates_tpu.kernels.msm_sorted import pack_points_g2

t0 = time.time()
fb2 = fixed_base_for(CURVE, "g2")
ax2, ay2, inf2 = fb2.to_affine(S_e)
jax.block_until_ready(ax2)
print(f"fixed_base g2 done {time.time()-t0:.1f}s", flush=True)
beta = g2.tower.beta - q
P128_2 = pack_points_g2(q, ax2, ay2)
t0 = time.time()
jx2, jy2, jz2 = msm_sorted_host(q, r, P128_2, S, cfg, beta=beta)
print(f"msm_sorted g2 done {time.time()-t0:.1f}s", flush=True)
G2 = g2.generator()
expect2 = G2 * expect_scalar
from zokrates_tpu.ec.tower import Fq2

if jz2 == (0, 0):
    got2 = None
else:
    zf = Fq2(g2.tower, jz2[0], jz2[1])
    zi = zf.inv()
    zi2 = zi * zi
    xf = Fq2(g2.tower, jx2[0], jx2[1]) * zi2
    yf = Fq2(g2.tower, jy2[0], jy2[1]) * zi2 * zi
    got2 = (xf, yf)
ok3 = got2 is not None and got2 == (expect2.x, expect2.y)
print(f"step3 msm_sorted_g2 N=2^15: {'PASS' if ok3 else 'FAIL'}", flush=True)

# ---- step 4: small e2e groth16 on TPU ----
from zokrates_tpu.interp.interpreter import Interpreter
from zokrates_tpu.ir.program import (
    Constraint,
    LinComb,
    Parameter,
    Prog,
    QuadComb,
    var_new,
    var_public,
)
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.schemes import groth16

x = var_new(0)
t1 = var_new(1)
t2 = var_new(2)
out = var_public(0)
stmts = [
    Constraint(QuadComb(LinComb.from_var(x), LinComb.from_var(x)), LinComb.from_var(t1)),
    Constraint(QuadComb(LinComb.from_var(t1), LinComb.from_var(x)), LinComb.from_var(t2)),
    Constraint(
        QuadComb(LinComb.one(), LinComb.from_var(t2) + LinComb.from_var(x) + LinComb.constant(5)),
        LinComb.from_var(out),
    ),
]
prog = Prog(curve=CURVE, arguments=[Parameter(x, private=True)], return_count=1, statements=stmts)
w = Interpreter().execute(prog, [3])
r1cs = r1cs_from_prog(prog)
t0 = time.time()
pk, vk = groth16.setup(r1cs)
proof = groth16.prove(r1cs, pk, w)
ok4 = groth16.verify(vk, proof)
print(f"step4 small e2e: {'PASS' if ok4 else 'FAIL'} ({time.time()-t0:.1f}s)", flush=True)
