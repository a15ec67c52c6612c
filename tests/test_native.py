"""Native C host backend (zokrates_tpu/native) vs the pure-Python oracle.

The native module replaces the prove tail's host bigint math: Montgomery
window combines, Jacobian adds/muls, affine conversion — over Fq and Fq2
for every supported curve whose limb layout fits (16-bit device limb
count == 4x the 64-bit count). Every op is cross-checked against the
Python EC classes / host Jacobian helpers it replaces.
"""

import random

import numpy as np
import pytest

from zokrates_tpu.ec.curve import g1_group, g2_group
from zokrates_tpu.fields import params as P
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
from zokrates_tpu.native import available, field_for

pytestmark = pytest.mark.skipif(not available(), reason="no C toolchain")

CURVES = ["bn128", "bls12_381", "bls12_377", "bw6_761", "pallas", "vesta"]


@pytest.mark.parametrize("curve", CURVES)
def test_g1_mul_add_affine(curve):
    p = P.BASE_FIELDS[curve].p
    r = P.SCALAR_FIELDS[curve].p
    nf = field_for(p)
    assert nf is not None, "all shipped curves fit the native limb layout"
    g = g1_group(curve).generator()
    jac = (g.x, g.y, 1)
    rng = random.Random(42)
    for _ in range(6):
        k = rng.randrange(0, r)
        exp = g * k
        aff = nf.g1_to_affine(nf.g1_mul(jac, k))
        if exp.infinity:
            assert aff is None
        else:
            assert aff == (exp.x, exp.y)
    a = nf.g1_mul(jac, 111)
    b = nf.g1_mul(jac, 222)
    assert nf.g1_to_affine(nf.g1_add(a, b)) == ((g * 333).x, (g * 333).y)
    # doubling branch of the general add
    assert nf.g1_to_affine(nf.g1_add(a, a)) == ((g * 222).x, (g * 222).y)
    # infinity handling
    inf = nf.g1_mul(jac, 0)
    assert nf.g1_to_affine(inf) is None
    assert nf.g1_to_affine(nf.g1_add(inf, a)) == ((g * 111).x, (g * 111).y)
    # P + (-P) = infinity
    neg = (a[0], (p - a[1]) % p, a[2])
    assert nf.g1_to_affine(nf.g1_add(a, neg)) is None


@pytest.mark.parametrize("curve", ["bn128", "bls12_381", "bls12_377"])
def test_g2_mul_add_affine(curve):
    p = P.BASE_FIELDS[curve].p
    r = P.SCALAR_FIELDS[curve].p
    grp = g2_group(curve)
    beta = grp.tower.beta
    nf2 = field_for(p, beta)
    assert nf2 is not None
    g = grp.generator()
    jac = ((g.x.c0, g.x.c1), (g.y.c0, g.y.c1), (1, 0))
    rng = random.Random(43)
    for _ in range(4):
        k = rng.randrange(1, r)
        exp = g * k
        aff = nf2.g2_to_affine(nf2.g2_mul(jac, k))
        assert aff == ((exp.x.c0, exp.x.c1), (exp.y.c0, exp.y.c1))
    a = nf2.g2_mul(jac, 7)
    b = nf2.g2_mul(jac, 9)
    s = nf2.g2_to_affine(nf2.g2_add(a, b))
    e = g * 16
    assert s == ((e.x.c0, e.x.c1), (e.y.c0, e.y.c1))


def _mont_rows(p, ints, nl16):
    """Canonical ints -> (k, nl16) u32 Montgomery 16-bit-limb rows."""
    R = pow(2, 16 * nl16, p)
    return ints_to_limbs([v * R % p for v in ints], nl16)


def test_combine_windows_matches_python():
    """Native combine vs the Python loop on random Jacobian window sums."""
    from zokrates_tpu.kernels.msm_sorted import (
        MSMConfig,
        _host_jac_add,
        _host_jac_double,
        _limbs_to_int,
    )

    curve = "bn128"
    p = P.BASE_FIELDS[curve].p
    r = P.SCALAR_FIELDS[curve].p
    nf = field_for(p)
    g = g1_group(curve).generator()
    nl16 = n_limbs(p)
    rng = random.Random(7)
    W, c = 5, 8
    jacs = [nf.g1_mul((g.x, g.y, 1), rng.randrange(1, r)) for _ in range(W)]
    wX = _mont_rows(p, [j[0] for j in jacs], nl16)
    wY = _mont_rows(p, [j[1] for j in jacs], nl16)
    wZ = _mont_rows(p, [j[2] for j in jacs], nl16)
    got = nf.combine_windows(wX, wY, wZ, W, c)
    # python oracle
    acc = (1, 1, 0)
    for w in range(W - 1, -1, -1):
        for _ in range(c):
            acc = _host_jac_double(p, acc)
        acc = _host_jac_add(p, acc, jacs[w])
    assert nf.g1_to_affine(got) == nf.g1_to_affine(acc)


def test_host_sparse_windows_g1():
    """Native sparse-window MSM + Horner combine vs direct Python EC."""
    import jax

    from zokrates_tpu.fields.limbs import n_limbs as _nlimbs
    from zokrates_tpu.schemes.groth16 import (
        _combine_host_g1,
        _pack_query,
        _signed_digits_np,
    )

    curve = "bn128"
    q = P.BASE_FIELDS[curve].p
    r = P.SCALAR_FIELDS[curve].p
    nf = field_for(q)
    grp = g1_group(curve)
    g = grp.generator()
    rng = random.Random(11)
    m = 24
    pts = [g * rng.randrange(1, r) for _ in range(m)]
    p128, _ = _pack_query(curve, [(p.x, p.y) for p in pts])
    zs = [rng.randrange(0, 1 << 28) for _ in range(m)]
    z_np = np.asarray(ints_to_limbs(zs, _nlimbs(r)))
    c, W = 8, 5
    digits, signs = _signed_digits_np(z_np, W, c)
    wins = []
    for w in range(W):
        nz = np.nonzero(digits[w])[0].astype(np.int32)
        wins.append(nf.sparse_window_g1(p128, nz, digits[w][nz], signs[w][nz]))
    total = _combine_host_g1(nf, wins[0], wins[1:], 1, c)
    exp = grp.zero()
    for i in range(m):
        exp = exp + pts[i] * zs[i]
    assert nf.g1_to_affine(total) == (exp.x, exp.y)


def test_combine_windows2_matches_python():
    from zokrates_tpu.kernels.msm_sorted import _host_jac_add2, _host_jac_double2

    curve = "bn128"
    p = P.BASE_FIELDS[curve].p
    r = P.SCALAR_FIELDS[curve].p
    grp = g2_group(curve)
    beta = grp.tower.beta
    nf2 = field_for(p, beta)
    g = grp.generator()
    nl16 = n_limbs(p)
    rng = random.Random(8)
    W, c = 4, 8
    jac0 = ((g.x.c0, g.x.c1), (g.y.c0, g.y.c1), (1, 0))
    jacs = [nf2.g2_mul(jac0, rng.randrange(1, r)) for _ in range(W)]

    def rows(i):
        flat = []
        for j in jacs:
            flat.append(j[i][0])
            flat.append(j[i][1])
        R = pow(2, 16 * nl16, p)
        arr = ints_to_limbs([v * R % p for v in flat], nl16)
        return arr.reshape(W, 2 * nl16)

    got = nf2.combine_windows2(rows(0), rows(1), rows(2), W, c)
    acc = ((1, 0), (1, 0), (0, 0))
    for w in range(W - 1, -1, -1):
        for _ in range(c):
            acc = _host_jac_double2(p, beta, acc)
        acc = _host_jac_add2(p, beta, acc, jacs[w])
    assert nf2.g2_to_affine(got) == nf2.g2_to_affine(acc)
