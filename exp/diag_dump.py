"""Part 1 (TPU): compute the bench prove's five MSMs with the sorted
backend and dump the resulting points (host ints) for the CPU checker."""

import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ["ZOKRATES_TPU_MSM"] = "sorted"
from zokrates_tpu.tpu_env import ensure_tpu_flags

ensure_tpu_flags()

import jax
import jax.numpy as jnp
import numpy as np

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
nls = n_limbs(p)

with open(f"{ART}/sha256.out", "rb") as f:
    prog = deserialize(f.read())
with open(f"{ART}/sha256.witness", "rb") as f:
    witness = Witness.read(f, FIELDS["bn128"])
r1cs = r1cs_from_prog(prog)
with open(f"{ART}/sha256.g16.keys", "rb") as f:
    obj = pickle.load(f)
pk, vk = (obj[1], obj[2]) if len(obj) == 3 else obj

z = [v % p for v in r1cs.full_assignment(witness)]
n = pk.domain_size
ni = pk.num_instance
m = len(z)
z_can = jnp.asarray(ints_to_limbs(z, nls))

dev = G._r1cs_device(r1cs, n)
h_can = G._h_stage(CURVE, n)(*G._coo_args(dev), z_can)[: n - 1]
h_ints = limbs_to_ints(np.asarray(jax.device_get(h_can)))

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
out = {"z": z, "h": h_ints, "ni": ni, "n": n}
for name, P128, S, mask in (
    ("a", d["a_pad"], z_can, d["a_mask"]),
    ("b1", d["b1_pad"], z_can, d["b1_mask"]),
    ("l", d["l_pad"], z_can[ni:], d["l_mask"]),
    ("h_msm", d["h_pad"], h_scal, None),
):
    t0 = time.time()
    r = G._msm_packed_g1(CURVE, P128, S, mask)
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)
    out[name] = None if r.x is None else (r.x, r.y)

b2 = G._msm_dev_g2(CURVE, d["b2x_pad"], d["b2y_pad"], z_can, d["b2_mask"])
out["b2"] = None if b2.x is None else (
    (b2.x.c0, b2.x.c1), (b2.y.c0, b2.y.c1)
)

with open("/tmp/diag_msm_dump.pkl", "wb") as f:
    pickle.dump(out, f)
print("dumped", flush=True)
