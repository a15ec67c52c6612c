"""Part 2 (CPU): independently recompute the bench prove MSMs with host
bigint math and compare against the TPU sorted-backend dump.

Host MSM cost is sum of scalar bit-lengths; the sha256 witness is mostly
bits (0/1), so a/b1/l are cheap. The h MSM has full-width scalars — use
windowed NAF per point only for nonzero scalars (32767 x ~130 adds ~ 4M
host point ops; a few minutes of Python).
"""

import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

from zokrates_tpu.ec.curve import PointG1, g1_group, g2_group
from zokrates_tpu.ec.pairing import pairing_product_is_one
from zokrates_tpu.ec.tower import Fq2
from zokrates_tpu.fields.field import FIELDS
from zokrates_tpu.fields import params as P
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.ir.serialize import deserialize
from zokrates_tpu.ir.witness import Witness

ART = "/root/repo/bench_artifacts"
CURVE = "bn128"
p = P.SCALAR_FIELDS[CURVE].p
q = P.BASE_FIELDS[CURVE].p

with open("/tmp/diag_msm_dump.pkl", "rb") as f:
    dump = pickle.load(f)
z, h_ints, ni = dump["z"], dump["h"], dump["ni"]

with open(f"{ART}/sha256.out", "rb") as f:
    prog = deserialize(f.read())
r1cs = r1cs_from_prog(prog)
with open(f"{ART}/sha256.g16.keys", "rb") as f:
    obj = pickle.load(f)
pk, vk = (obj[1], obj[2]) if len(obj) == 3 else obj

# scalar histogram
from collections import Counter

bits = Counter(v.bit_length() for v in z)
print("witness bitlen histogram (top):", bits.most_common(8), flush=True)

# host Jacobian ops over ints
def jac_add(P1, Q):
    from zokrates_tpu.kernels.msm_sorted import _host_jac_add

    return _host_jac_add(q, P1, Q)

def jac_double(P1):
    from zokrates_tpu.kernels.msm_sorted import _host_jac_double

    return _host_jac_double(q, P1)

def host_msm(points, scalars):
    """points: list of (x, y) or None; scalars ints. Single joint
    double-and-add over max bitlength (Σ adds = popcounts)."""
    maxb = max((s.bit_length() for s in scalars), default=0)
    acc = (1, 1, 0)
    for k in range(maxb - 1, -1, -1):
        acc = jac_double(acc)
        for pt, s in zip(points, scalars):
            if pt is not None and (s >> k) & 1:
                acc = jac_add(acc, (pt[0], pt[1], 1))
    return acc

def to_affine(j):
    X, Y, Z = j
    if Z == 0:
        return None
    zi = pow(Z, -1, q)
    return (X * zi * zi % q, Y * zi * zi % q * zi % q)

t0 = time.time()
a_pts = pk._unpack_g1(pk.a_p128, pk.a_mask)
b1_pts = pk._unpack_g1(pk.b1_p128, pk.b1_mask)
l_pts = pk._unpack_g1(pk.l_p128, pk.l_mask)
h_pts = pk._unpack_g1(pk.h_p128)
print(f"unpack {time.time()-t0:.1f}s", flush=True)

m = len(z)
for name, pts, scal in (
    ("a", a_pts[:m], z),
    ("b1", b1_pts[:m], z),
    ("l", l_pts[: m - ni], z[ni:]),
):
    t0 = time.time()
    got = to_affine(host_msm(pts, scal))
    ok = got == dump[name]
    print(f"{name}: {'PASS' if ok else 'FAIL'} ({time.time()-t0:.1f}s)", flush=True)
    if not ok:
        print(f"  host {got}\n  tpu  {dump[name]}", flush=True)

# h MSM: full-width scalars. Joint double-and-add: 254 doublings +
# sum(popcount) adds ~ 127*32767 ~ 4.2M adds. Each add ~ 16 bigint muls
# -> ~1 min of Python per 1M adds. Use 4-bit windows instead:
# precompute per-point multiples is worse. Go bucket route: c=8 digits.
def host_msm_pippenger(points, scalars, c=8):
    W = -(-254 // c)
    acc = (1, 1, 0)
    for w in range(W - 1, -1, -1):
        for _ in range(c if w != W - 1 else 0):
            acc = jac_double(acc)
        if w == W - 1:
            pass
        buckets = {}
        for pt, s in zip(points, scalars):
            if pt is None:
                continue
            d = (s >> (w * c)) & ((1 << c) - 1)
            if d:
                if d in buckets:
                    buckets[d] = jac_add(buckets[d], (pt[0], pt[1], 1))
                else:
                    buckets[d] = (pt[0], pt[1], 1)
        run = (1, 1, 0)
        tot = (1, 1, 0)
        for d in range(max(buckets) if buckets else 0, 0, -1):
            if d in buckets:
                run = jac_add(run, buckets[d])
            tot = jac_add(tot, run)
        acc = jac_add(acc, tot)
    # doublings applied before each window except the first processed; fix:
    return acc

# correct pippenger with doublings between windows
def host_msm_pip(points, scalars, c=8):
    W = -(-256 // c)
    acc = (1, 1, 0)
    for w in range(W - 1, -1, -1):
        acc_sq = acc
        for _ in range(c):
            acc_sq = jac_double(acc_sq)
        acc = acc_sq
        buckets = {}
        for pt, s in zip(points, scalars):
            if pt is None:
                continue
            d = (s >> (w * c)) & ((1 << c) - 1)
            if d:
                if d in buckets:
                    buckets[d] = jac_add(buckets[d], (pt[0], pt[1], 1))
                else:
                    buckets[d] = (pt[0], pt[1], 1)
        run = (1, 1, 0)
        tot = (1, 1, 0)
        for d in range(max(buckets) if buckets else 0, 0, -1):
            if d in buckets:
                run = jac_add(run, buckets[d])
            tot = jac_add(tot, run)
        acc = jac_add(acc, tot)
    return acc

t0 = time.time()
n = dump["n"]
got = to_affine(host_msm_pip(h_pts[: n - 1], h_ints))
ok = got == dump["h_msm"]
print(f"h_msm: {'PASS' if ok else 'FAIL'} ({time.time()-t0:.1f}s)", flush=True)
if not ok:
    print(f"  host {got}\n  tpu  {dump['h_msm']}", flush=True)

# b2 via bilinearity against host-correct b1
g1 = g1_group(CURVE)
g2 = g2_group(CURVE)
b1_aff = to_affine(host_msm(b1_pts[:m], z))
b1_pt = g1.zero() if b1_aff is None else PointG1(g1, b1_aff[0], b1_aff[1])
if dump["b2"] is None:
    print("b2: TPU says zero — check manually", flush=True)
else:
    (xc0, xc1), (yc0, yc1) = dump["b2"]
    from zokrates_tpu.ec.curve import PointG2

    b2_pt = PointG2(g2, Fq2(g2.tower, xc0, xc1), Fq2(g2.tower, yc0, yc1))
    ok = pairing_product_is_one(
        CURVE, [(-b1_pt, g2.generator()), (g1.generator(), b2_pt)]
    )
    print(f"b2 bilinearity: {'PASS' if ok else 'FAIL'}", flush=True)
