"""Field layer tests: scalar oracle axioms + device limb arithmetic vs oracle.

Mirrors the reference's field unit tests (zokrates_field/src/bn128.rs tests:
axioms, serialization roundtrip, required_bits) plus bit-exact checks of the
JAX Montgomery ops against Python bigints.
"""

import random

import numpy as np
import pytest

from zokrates_tpu.fields import params as P
from zokrates_tpu.fields.field import (
    FIELDS,
    Bn128Field,
    DummyField,
    make_field_p,
)
from zokrates_tpu.fields.jfield import field_ops
from zokrates_tpu.fields.limbs import ints_to_limbs, limbs_to_ints, n_limbs


def _miller_rabin(n, k=30):
    if n < 2:
        return False
    for p in [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37]:
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    rnd = random.Random(12345)
    for _ in range(k):
        a = rnd.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


class TestParams:
    def test_all_moduli_prime(self):
        for fp in list(P.SCALAR_FIELDS.values()) + list(P.BASE_FIELDS.values()):
            assert _miller_rabin(fp.p), fp.name

    def test_required_bits(self):
        assert P.SCALAR_FIELDS["bn128"].bits == 254
        assert P.SCALAR_FIELDS["bls12_381"].bits == 255
        assert P.SCALAR_FIELDS["bls12_377"].bits == 253
        assert P.SCALAR_FIELDS["bw6_761"].bits == 377
        assert P.BASE_FIELDS["bw6_761"].bits == 761

    def test_two_adicity(self):
        # NTT domains need large 2-Sylow subgroups
        assert P.SCALAR_FIELDS["bn128"].two_adicity == 28
        assert P.SCALAR_FIELDS["bls12_381"].two_adicity == 32
        assert P.SCALAR_FIELDS["bls12_377"].two_adicity == 47

    def test_two_adic_root(self):
        for name in ["bn128", "bls12_381", "bls12_377"]:
            fp = P.SCALAR_FIELDS[name]
            w = fp.two_adic_root
            s = fp.two_adicity
            assert pow(w, 1 << s, fp.p) == 1
            assert pow(w, 1 << (s - 1), fp.p) == fp.p - 1  # primitive

    def test_bw6_links_bls377(self):
        assert P.SCALAR_FIELDS["bw6_761"].p == P.BASE_FIELDS["bls12_377"].p


class TestScalarField:
    def test_axioms(self, rng):
        for name, F in FIELDS.items():
            for _ in range(20):
                a, b, c = (F(rng.randrange(F.P)) for _ in range(3))
                assert (a + b) + c == a + (b + c)
                assert a + b == b + a
                assert a * (b + c) == a * b + a * c
                assert a + F.zero() == a
                assert a * F.one() == a
                assert a - a == F.zero()
                if not a.is_zero():
                    assert a * a.inverse_mul() == F.one()

    def test_serialization_roundtrip(self, rng):
        for name, F in FIELDS.items():
            for _ in range(10):
                a = F(rng.randrange(F.P))
                assert F.from_byte_vector(a.to_byte_vector()) == a

    def test_byte_width(self):
        # arkworks BigInt width: 64-bit limb padded
        assert Bn128Field.NBYTES == 32
        assert FIELDS["bls12_381"].NBYTES == 32
        assert FIELDS["bw6_761"].NBYTES == 48

    def test_max_unique_value(self):
        assert int(Bn128Field.max_unique_value()) == (1 << 253) - 1

    def test_compact_dec_string(self):
        F = Bn128Field
        assert F(1).to_compact_dec_string() == "1"
        assert (F.zero() - F(1)).to_compact_dec_string() == "(-1)"

    def test_dummy_field(self):
        assert DummyField.P == 7
        assert (DummyField(5) + DummyField(4)).v == 2

    def test_id_stable(self):
        # ids must be 4 distinct bytes strings per curve
        ids = {F.id() for F in FIELDS.values()}
        assert len(ids) == len(FIELDS)
        assert all(len(i) == 4 for i in ids)


class TestLimbs:
    def test_roundtrip(self, rng):
        p = P.SCALAR_FIELDS["bn128"].p
        nl = n_limbs(p)
        xs = [rng.randrange(p) for _ in range(32)]
        assert limbs_to_ints(ints_to_limbs(xs, nl)) == xs


@pytest.mark.parametrize("curve", ["bn128", "bls12_381", "bw6_761"])
class TestJField:
    def _setup(self, curve, rng, n=64):
        p = P.SCALAR_FIELDS[curve].p
        ops = field_ops(p)
        xs = [rng.randrange(p) for _ in range(n)]
        ys = [rng.randrange(p) for _ in range(n)]
        return p, ops, xs, ys

    def test_encode_decode(self, curve, rng):
        p, ops, xs, _ = self._setup(curve, rng)
        assert ops.decode(ops.encode(xs)) == xs

    def test_add_sub_neg(self, curve, rng):
        p, ops, xs, ys = self._setup(curve, rng)
        a, b = ops.encode(xs), ops.encode(ys)
        assert ops.decode(ops.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
        assert ops.decode(ops.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
        assert ops.decode(ops.neg(a)) == [(-x) % p for x in xs]

    def test_mul(self, curve, rng):
        p, ops, xs, ys = self._setup(curve, rng)
        a, b = ops.encode(xs), ops.encode(ys)
        assert ops.decode(ops.mul(a, b)) == [(x * y) % p for x, y in zip(xs, ys)]

    def test_mul_edge_cases(self, curve, rng):
        p, ops, _, _ = self._setup(curve, rng)
        edge = [0, 1, p - 1, p - 2, (p - 1) // 2, 2]
        a = ops.encode(edge)
        b = ops.encode(list(reversed(edge)))
        assert ops.decode(ops.mul(a, b)) == [
            (x * y) % p for x, y in zip(edge, reversed(edge))
        ]

    def test_pow_inv(self, curve, rng):
        p, ops, xs, _ = self._setup(curve, rng, n=8)
        a = ops.encode(xs)
        assert ops.decode(ops.pow_const(a, 5)) == [pow(x, 5, p) for x in xs]
        inv = ops.inv(a)
        assert ops.decode(inv) == [pow(x, -1, p) if x else 0 for x in xs]

    def test_select_eq(self, curve, rng):
        import jax.numpy as jnp

        p, ops, xs, ys = self._setup(curve, rng, n=8)
        a, b = ops.encode(xs), ops.encode(ys)
        cond = jnp.asarray([i % 2 == 0 for i in range(8)])
        sel = ops.select(cond, a, b)
        expect = [x if i % 2 == 0 else y for i, (x, y) in enumerate(zip(xs, ys))]
        assert ops.decode(sel) == expect
        assert list(np.asarray(ops.eq(a, a))) == [True] * 8
