"""Unit tests for the sumcheck (schemes/sumcheck.py) and inner-product
argument (schemes/ipa.py) primitives behind the succinct Nova compress."""

import numpy as np
import pytest

from zokrates_tpu.fields import params as P
from zokrates_tpu.schemes.ipa import IpaProof, ipa_prove, ipa_verify
from zokrates_tpu.schemes.marlin import _Transcript
from zokrates_tpu.schemes.sumcheck import (
    eq_point,
    eq_table,
    mle_eval,
    sumcheck_prove,
    sumcheck_verify,
)

p = P.SCALAR_FIELDS["pallas"].p
rng = np.random.default_rng(0)


def rand_vec(n):
    return [int.from_bytes(rng.bytes(40), "little") % p for _ in range(n)]


def test_eq_table_matches_point():
    r = rand_vec(4)
    tbl = eq_table(r, p)
    for j in (0, 3, 9, 15):
        bits = [(j >> (3 - i)) & 1 for i in range(4)]
        assert tbl[j] == eq_point(r, bits, p)


def test_mle_eval_on_cube_points():
    vec = rand_vec(8)
    for j in range(8):
        bits = [(j >> (2 - i)) & 1 for i in range(3)]
        assert mle_eval(vec, bits, p) == vec[j]


def test_sumcheck_product_roundtrip():
    a, b = rand_vec(16), rand_vec(16)
    claim = sum(x * y for x, y in zip(a, b)) % p
    trp = _Transcript(b"t")
    msgs, rs, finals = sumcheck_prove(
        trp, p, [a, b], lambda x, y: x * y % p, 2
    )
    trv = _Transcript(b"t")
    out = sumcheck_verify(trv, p, claim, msgs, 2)
    assert out is not None
    rs_v, final_claim = out
    assert rs_v == rs
    assert final_claim == finals[0] * finals[1] % p
    assert finals[0] == mle_eval(a, rs, p)
    assert finals[1] == mle_eval(b, rs, p)


def test_sumcheck_rejects_wrong_claim():
    a, b = rand_vec(8), rand_vec(8)
    claim = (sum(x * y for x, y in zip(a, b)) + 1) % p
    trp = _Transcript(b"t")
    msgs, _, _ = sumcheck_prove(trp, p, [a, b], lambda x, y: x * y % p, 2)
    assert sumcheck_verify(_Transcript(b"t"), p, claim, msgs, 2) is None


def _bases(n, label=b"test"):
    from zokrates_tpu.schemes.nova import _hash_to_curve

    return _hash_to_curve("pallas", label, n)


def test_ipa_roundtrip():
    q = P.BASE_FIELDS["pallas"].p
    n = 8
    bases = _bases(n)
    (Q,) = _bases(1, b"Q")
    w = rand_vec(n)
    c = rand_vec(n)
    v = sum(x * y for x, y in zip(w, c)) % p
    from zokrates_tpu.schemes.ipa import _aff, _msm_host
    from zokrates_tpu.ec.jacobian import jac_to_affine

    com = _aff(jac_to_affine(q, _msm_host(q, bases, w)))
    pr = ipa_prove(_Transcript(b"ipa"), p, q, bases, Q, w, c)
    assert ipa_verify(_Transcript(b"ipa"), p, q, bases, Q, com, c, v, pr)
    # wrong value rejected
    assert not ipa_verify(
        _Transcript(b"ipa"), p, q, bases, Q, com, c, (v + 1) % p, pr
    )
    # tampered final scalar rejected
    bad = IpaProof(Ls=pr.Ls, Rs=pr.Rs, w0=(pr.w0 + 1) % p)
    assert not ipa_verify(_Transcript(b"ipa"), p, q, bases, Q, com, c, v, bad)
