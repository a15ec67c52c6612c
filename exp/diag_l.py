"""Drill into the failing l MSM: check the collision flag, compare safe
vs unsafe kernel outputs, and compare per-window sums vs a host simulation
of the signed-digit decomposition."""

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
from zokrates_tpu.fields.jfield import field_spec
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.ir.serialize import deserialize
from zokrates_tpu.ir.witness import Witness
from zokrates_tpu.kernels import msm_sorted as M
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

z = [v % p for v in r1cs.full_assignment(witness)]
ni = pk.num_instance
m = len(z)
tier_l = G._msm_tier(max(1, m - ni))
P128 = jnp.asarray(G._pad_rows(pk.l_p128, tier_l))
S = jnp.asarray(ints_to_limbs(z[ni:], nls))
mask = jnp.asarray(pk.l_mask)
mm = S.shape[0]
S = jnp.where(mask[:mm, None], S, 0)
S = jnp.pad(S, ((0, tier_l - mm), (0, 0)))
N = tier_l

cfg = M.default_config(N)
W = M._windows(p, cfg.c)
fold = M._fold_override(cfg)
print(f"cfg={cfg} W={W} fold={fold}", flush=True)

t0 = time.time()
out_u, coll_u = M._msm_jit(q, W, N, cfg, False, None, fold)(P128, S)
print(f"unsafe done {time.time()-t0:.1f}s coll={int(jax.device_get(coll_u))}",
      flush=True)
t0 = time.time()
out_s, coll_s = M._msm_jit(q, W, N, cfg, True, None, fold)(P128, S)
print(f"safe done {time.time()-t0:.1f}s", flush=True)

wu = [np.asarray(jax.device_get(a)) for a in out_u]
ws = [np.asarray(jax.device_get(a)) for a in out_s]

# host window sums from the same signed-digit decomposition
scal = z[ni:] + [0] * (N - mm)
lmask = list(pk.l_mask) + [False] * (N - mm)
pts = pk._unpack_g1(pk.l_p128, pk.l_mask)
pts = pts + [None] * (N - len(pts))

c = cfg.c
half = 1 << (c - 1)
full = 1 << c


def signed_digits(s):
    digs = []
    carry = 0
    for w in range(W):
        raw = ((s >> (w * c)) & (full - 1)) + carry
        if raw >= half:
            digs.append(raw - full)
            carry = 1
        else:
            digs.append(raw)
            carry = 0
    return digs


from zokrates_tpu.kernels.msm_sorted import _host_jac_add, _limbs_to_int

spec = field_spec(q)
rinv = pow(spec.r, -1, q)

win_sums = [(1, 1, 0) for _ in range(W)]
for i, (pt, s) in enumerate(zip(pts, scal)):
    if pt is None or s == 0:
        continue
    for w, d in enumerate(signed_digits(s)):
        if d == 0:
            continue
        y = pt[1] if d > 0 else (q - pt[1]) % q
        for _ in range(abs(d)):
            pass
        # bucket semantics: window sum = sum_b b * S_b; equivalently each
        # point contributes d * P to window w. Accumulate d*P directly.
        # d is tiny (|d| <= 128) -> repeated add is fine but wasteful;
        # use scalar mult via double-and-add on |d|.
        X, Y, Z = pt[0], y, 1
        dd = abs(d)
        acc = (1, 1, 0)
        base = (X, Y, Z)
        while dd:
            if dd & 1:
                acc = _host_jac_add(q, acc, base)
            dd >>= 1
            if dd:
                from zokrates_tpu.kernels.msm_sorted import _host_jac_double

                base = _host_jac_double(q, base)
        win_sums[w] = _host_jac_add(q, win_sums[w], acc)


def to_aff(j):
    X, Y, Z = j
    if Z == 0:
        return None
    zi = pow(Z, -1, q)
    return (X * zi * zi % q, Y * zi * zi % q * zi % q)


def kern_window_aff(wXYZ, w):
    X = _limbs_to_int(wXYZ[0][w]) * rinv % q
    Y = _limbs_to_int(wXYZ[1][w]) * rinv % q
    Z = _limbs_to_int(wXYZ[2][w]) * rinv % q
    return to_aff((X, Y, Z))


bad_u, bad_s = [], []
for w in range(W):
    hostw = to_aff(win_sums[w])
    ku = kern_window_aff(wu, w)
    ks = kern_window_aff(ws, w)
    if ku != hostw:
        bad_u.append(w)
    if ks != hostw:
        bad_s.append(w)
print(f"unsafe bad windows: {bad_u}", flush=True)
print(f"safe bad windows:   {bad_s}", flush=True)
