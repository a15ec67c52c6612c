"""BW6-761 pairing oracle: bilinearity, non-degeneracy, and GM17 over
bw6_761 end-to-end (the composition-layer curve the in-circuit BLS12-377
verifier runs on — reference zokrates_embed/src/ark.rs)."""

import pytest

from zokrates_tpu.ec.curve import g1_group, g2_group
from zokrates_tpu.ec.pairing import pairing_product_is_one
from zokrates_tpu.ec.pairing_bw6 import (
    Fq6w,
    final_exponentiation_bw6,
    miller_loop_bw6,
)


def _pairing(P, Q):
    return final_exponentiation_bw6(miller_loop_bw6(P, Q))


class TestBW6Pairing:
    def test_nondegenerate_and_bilinear(self):
        g1 = g1_group("bw6_761")
        g2 = g2_group("bw6_761")
        P, Q = g1.generator(), g2.generator()
        e = _pairing(P, Q)
        assert not e.is_one()
        a, b = 94823, 51771
        assert _pairing(P * a, Q * b) == e.pow(a * b % g1.r)

    def test_pairing_product(self):
        g1 = g1_group("bw6_761")
        g2 = g2_group("bw6_761")
        P, Q = g1.generator(), g2.generator()
        a = 777
        assert pairing_product_is_one("bw6_761", [(P * a, Q), (-P, Q * a)])
        assert not pairing_product_is_one("bw6_761", [(P * a, Q), (-P, Q * (a + 1))])

    def test_infinity_pairs_are_identity(self):
        g1 = g1_group("bw6_761")
        g2 = g2_group("bw6_761")
        assert miller_loop_bw6(g1.zero(), g2.generator()).is_one()
        assert miller_loop_bw6(g1.generator(), g2.zero()).is_one()

    def test_fq6_inverse(self):
        z = Fq6w([3, 1, 4, 1, 5, 9])
        assert (z * z.inv()).is_one()


class TestGM17OverBW6:
    def test_prove_verify_bw6_761(self):
        from tests.test_groth16 import cube_prog
        from zokrates_tpu.interp.interpreter import Interpreter
        from zokrates_tpu.ir.r1cs import r1cs_from_prog
        from zokrates_tpu.schemes import gm17

        prog = cube_prog("bw6_761")
        r1cs = r1cs_from_prog(prog)
        pk, vk = gm17.setup(r1cs)
        w = Interpreter().execute(prog, [3])
        proof = gm17.prove(r1cs, pk, w)
        assert gm17.verify(vk, proof)
        proof.points["a"] = proof.points["c"]
        assert not gm17.verify(vk, proof)
