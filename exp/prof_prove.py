"""Stage-by-stage steady-state timing of the sha256 Groth16 prove on TPU."""

import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
from zokrates_tpu.tpu_env import ensure_tpu_flags

ensure_tpu_flags()

import jax
import jax.numpy as jnp
import numpy as np

from zokrates_tpu.fields.field import FIELDS
from zokrates_tpu.fields import params as P
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
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

# ---- warm everything with one full prove ----
t0 = time.time()
proof = G.prove(r1cs, pk, witness)
print(f"warm prove: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
proof = G.prove(r1cs, pk, witness)
print(f"steady prove: {(time.time()-t0)*1e3:.0f} ms", flush=True)


def t(name, fn, iters=3):
    fn()
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.1f} ms", flush=True)
    return out


z = t("full_assignment+mod", lambda: [v % p for v in r1cs.full_assignment(witness)])
n = pk.domain_size
ni = pk.num_instance
m = len(z)
z_can = t("ints_to_limbs(z)", lambda: jnp.asarray(ints_to_limbs(z, nls)))

dev = G._r1cs_device(r1cs, n)
hj = G._h_stage(CURVE, n)


def h_run():
    out = hj(*G._coo_args(dev), z_can)[: n - 1]
    jax.block_until_ready(out)
    np.asarray(jax.device_get(out[:1]))
    return out


h_can = t("h_stage (matvecs+7 NTT)", h_run)

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

for name, P128, S, mask in (
    ("msm a", d["a_pad"], z_can, d["a_mask"]),
    ("msm b1", d["b1_pad"], z_can, d["b1_mask"]),
    ("msm l", d["l_pad"], z_can[ni:], d["l_mask"]),
    ("msm h", d["h_pad"], h_can, None),
):
    t(name, lambda P128=P128, S=S, mask=mask: G._msm_packed_g1(CURVE, P128, S, mask))

t("msm b2 (G2)", lambda: G._msm_dev_g2(CURVE, d["b2x_pad"], d["b2y_pad"], z_can, d["b2_mask"]))

# isolate device-vs-host parts of one sorted MSM
from zokrates_tpu.kernels import msm_sorted as M

cfg = M.default_config(tier_m)
W = M._windows(p, cfg.c)
fold = M._fold_override(cfg)
jit = M._msm_jit(P.BASE_FIELDS[CURVE].p, W, tier_m, cfg, False, None, fold)
Sa = jnp.where(d["a_mask"][:m, None], z_can, 0)
Sa = jnp.pad(Sa, ((0, tier_m - m), (0, 0)))


def dev_only():
    out, coll = jit(d["a_pad"], Sa)
    jax.block_until_ready(out)
    return out, coll


out, coll = t("msm a device-only", dev_only)
wout = [np.asarray(jax.device_get(a)) for a in out]
t("combine_windows host", lambda: M.combine_windows(
    P.BASE_FIELDS[CURVE].p, p, wout, W, cfg))
t("device_get(out)", lambda: [np.asarray(jax.device_get(a)) for a in out])
