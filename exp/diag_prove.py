"""Isolate the sha256-bench verify failure: cross-check every prove stage
on the REAL bench inputs.

  h:   polynomial identity A(x0)B(x0) - C(x0) == h(x0) Z(x0) at random x0
       (host Lagrange evaluation from device matvec evals vs device h).
  G1:  a/b1/l/h MSMs, sorted backend vs the independent XLA Pippenger.
  G2:  b2 sorted result vs bilinearity e(b1, G2) == e(G1, b2) where b1 is
       computed over the SAME scalars on the G1 b-query (same b_t values).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
from zokrates_tpu.tpu_env import ensure_tpu_flags

ensure_tpu_flags()

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from zokrates_tpu.ec.curve import PointG1, PointG2, g1_group, g2_group
from zokrates_tpu.fields.field import FIELDS
from zokrates_tpu.fields import params as P
from zokrates_tpu.fields.limbs import ints_to_limbs, limbs_to_ints, n_limbs
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.ir.serialize import deserialize
from zokrates_tpu.ir.witness import Witness
from zokrates_tpu.schemes import groth16 as G

ART = "/root/repo/bench_artifacts"
CURVE = "bn128"
p = P.SCALAR_FIELDS[CURVE].p
q = P.BASE_FIELDS[CURVE].p
nls = n_limbs(p)

with open(f"{ART}/sha256.out", "rb") as f:
    prog = deserialize(f.read())
with open(f"{ART}/sha256.witness", "rb") as f:
    witness = Witness.read(f, FIELDS["bn128"])
r1cs = r1cs_from_prog(prog)
with open(f"{ART}/sha256.g16.keys", "rb") as f:
    obj = pickle.load(f)
pk, vk = (obj[1], obj[2]) if len(obj) == 3 else obj
print(f"m={r1cs.num_variables} nc={r1cs.num_constraints} ni={r1cs.num_instance} "
      f"n={pk.domain_size}", flush=True)

z = [v % p for v in r1cs.full_assignment(witness)]
n = pk.domain_size
ni = pk.num_instance
m = len(z)
z_can = jnp.asarray(ints_to_limbs(z, nls))

# ---------------- h identity check ----------------
dev = G._r1cs_device(r1cs, n)
h_can = G._h_stage(CURVE, n)(*G._coo_args(dev), z_can)[: n - 1]
h_ints = limbs_to_ints(np.asarray(jax.device_get(h_can)))

# host matvec evals (with instance-binding rows)
a_e = [0] * n
b_e = [0] * n
c_e = [0] * n
for r, row in enumerate(r1cs.A):
    a_e[r] = sum(c * z[i] for i, c in row) % p
for r, row in enumerate(r1cs.B):
    b_e[r] = sum(c * z[i] for i, c in row) % p
for r, row in enumerate(r1cs.C):
    c_e[r] = sum(c * z[i] for i, c in row) % p
for j in range(ni):
    a_e[r1cs.num_constraints + j] = (a_e[r1cs.num_constraints + j] + z[j]) % p

from zokrates_tpu.kernels.ntt import domain_for_curve

dom = domain_for_curve(CURVE, n)
omega = dom.omega

x0 = 0xDEADBEEF12345678AABBCCDD % p
z_x0 = (pow(x0, n, p) - 1) % p
n_inv = pow(n, -1, p)
# batch-inverted Lagrange denominators
w_r = 1
dens = []
ws = []
for r in range(n):
    ws.append(w_r)
    dens.append((x0 - w_r) % p)
    w_r = w_r * omega % p
# batch inversion
pref = [1] * (n + 1)
for i in range(n):
    pref[i + 1] = pref[i] * dens[i] % p
inv_all = pow(pref[n], -1, p)
invs = [0] * n
for i in range(n - 1, -1, -1):
    invs[i] = pref[i] * inv_all % p
    inv_all = inv_all * dens[i] % p

def lag_eval(vals):
    acc = 0
    for r in range(n):
        acc += vals[r] * ws[r] % p * invs[r] % p
    return acc % p * z_x0 % p * n_inv % p

A0 = lag_eval(a_e)
B0 = lag_eval(b_e)
C0 = lag_eval(c_e)
h0 = 0
xp = 1
for c in h_ints:
    h0 = (h0 + c * xp) % p
    xp = xp * x0 % p
lhs = (A0 * B0 - C0) % p
rhs = h0 * z_x0 % p
print(f"h identity: {'PASS' if lhs == rhs else 'FAIL'}", flush=True)

# ---------------- G1 MSMs sorted vs XLA ----------------
d = pk.dev()
tier_m = G._msm_tier(m)
tier_h = G._msm_tier(n - 1)
tier_l = G._msm_tier(max(1, m - ni))
for key, src, tier in (
    ("a_pad", pk.a_p128, tier_m),
    ("b1_pad", pk.b1_p128, tier_m),
    ("h_pad", pk.h_p128, tier_h),
    ("l_pad", pk.l_p128, tier_l),
    ("b2x_pad", pk.b2_x, tier_m),
    ("b2y_pad", pk.b2_y, tier_m),
):
    if key not in d:
        d[key] = jnp.asarray(G._pad_rows(src, tier))

h_scal = jnp.asarray(np.asarray(jax.device_get(h_can)))

cases = [
    ("a", d["a_pad"], z_can, d["a_mask"]),
    ("b1", d["b1_pad"], z_can, d["b1_mask"]),
    ("l", d["l_pad"], z_can[ni:], d["l_mask"]),
    ("h", d["h_pad"], h_scal, None),
]
results = {}
for name, P128, S, mask in cases:
    os.environ["ZOKRATES_TPU_MSM"] = "sorted"
    t0 = time.time()
    r_sorted = G._msm_packed_g1(CURVE, P128, S, mask)
    ts = time.time() - t0
    os.environ["ZOKRATES_TPU_MSM"] = "xla"
    t0 = time.time()
    r_xla = G._msm_packed_g1(CURVE, P128, S, mask)
    tx = time.time() - t0
    ok = (r_sorted.x, r_sorted.y) == (r_xla.x, r_xla.y)
    results[name] = r_xla
    print(f"msm {name}: {'PASS' if ok else 'FAIL'} (sorted {ts:.1f}s, xla {tx:.1f}s)",
          flush=True)
    if not ok:
        print(f"  sorted ({r_sorted.x},{r_sorted.y})\n  xla    ({r_xla.x},{r_xla.y})")

# ---------------- G2 bilinearity ----------------
os.environ["ZOKRATES_TPU_MSM"] = "sorted"
b2_acc = G._msm_dev_g2(CURVE, d["b2x_pad"], d["b2y_pad"], z_can, d["b2_mask"])
b1_acc = results["b1"]
from zokrates_tpu.ec.pairing import pairing_product_is_one

g1 = g1_group(CURVE).generator()
g2 = g2_group(CURVE).generator()
ok = pairing_product_is_one(CURVE, [(-b1_acc, g2), (g1, b2_acc)])
print(f"msm b2 bilinearity vs b1: {'PASS' if ok else 'FAIL'}", flush=True)
