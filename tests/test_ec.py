"""EC group + pairing tests: generator validity, group laws, bilinearity.

Bilinearity e(aP, bQ) == e(P, Q)^(ab) is the ground-truth check standing in
for the reference's arkworks pairing (not runnable in this image): it fails
for any error in tower arithmetic, twist embedding, Miller loop, or final
exponentiation.
"""

import pytest

from zokrates_tpu.ec.curve import PointG1, PointG2, g1_group, g2_group
from zokrates_tpu.ec.pairing import pairing, pairing_product_is_one


def _raw_mul(pt, k):
    acc = type(pt)(pt.curve, None, None)
    add = pt
    while k:
        if k & 1:
            acc = acc + add
        add = add + add
        k >>= 1
    return acc


ALL_G1 = ["bn128", "bls12_381", "bls12_377", "bw6_761", "pallas", "vesta"]
PAIRING_CURVES = ["bn128", "bls12_381", "bls12_377"]


class TestGroups:
    @pytest.mark.parametrize("curve", ALL_G1)
    def test_g1_generator(self, curve):
        grp = g1_group(curve)
        g = grp.generator()
        assert g.is_on_curve()
        assert _raw_mul(g, grp.r).infinity

    @pytest.mark.parametrize("curve", PAIRING_CURVES + ["bw6_761"])
    def test_g2_generator(self, curve):
        grp = g2_group(curve)
        g = grp.generator()
        assert g.is_on_curve()
        assert _raw_mul(g, grp.r).infinity

    @pytest.mark.parametrize("curve", ["bn128", "bls12_381"])
    def test_group_laws(self, curve, rng):
        grp = g1_group(curve)
        g = grp.generator()
        a, b = rng.randrange(1, grp.r), rng.randrange(1, grp.r)
        pa, pb = g * a, g * b
        assert pa + pb == pb + pa
        assert (pa + pb) + pa == pa + (pb + pa)
        assert (g * a) * 2 == g * (2 * a % grp.r)
        assert (pa - pa).infinity
        assert pa + grp.zero() == pa

    def test_scalar_mul_matches_addition_chain(self):
        g = g1_group("bn128").generator()
        acc = g1_group("bn128").zero()
        for _ in range(7):
            acc = acc + g
        assert acc == g * 7


class TestPairing:
    @pytest.mark.parametrize("curve", PAIRING_CURVES)
    def test_bilinearity(self, curve, rng):
        g1 = g1_group(curve).generator()
        g2 = g2_group(curve).generator()
        r = g1_group(curve).r
        a, b = rng.randrange(2, 2**30), rng.randrange(2, 2**30)
        lhs = pairing(curve, g1 * a, g2 * b)
        rhs = pairing(curve, g1, g2).pow(a * b % r)
        assert lhs == rhs
        assert not lhs.is_one()

    @pytest.mark.parametrize("curve", ["bn128"])
    def test_nondegeneracy_and_inverse(self, curve):
        g1 = g1_group(curve).generator()
        g2 = g2_group(curve).generator()
        e = pairing(curve, g1, g2)
        assert not e.is_one()
        # e(P,Q) * e(-P,Q) == 1
        assert pairing_product_is_one(curve, [(g1, g2), (-g1, g2)])

    @pytest.mark.parametrize("curve", PAIRING_CURVES)
    def test_pairing_product(self, curve):
        g1 = g1_group(curve).generator()
        g2 = g2_group(curve).generator()
        # e(2P, 3Q) * e(-6P, Q) == 1
        assert pairing_product_is_one(
            curve, [(g1 * 2, g2 * 3), (_raw_mul(g1, g1.curve.r - 6), g2)]
        )

    def test_infinity_pairs(self):
        g1 = g1_group("bn128").generator()
        g2 = g2_group("bn128").generator()
        inf1 = g1_group("bn128").zero()
        assert pairing("bn128", inf1, g2).is_one()
