"""End-to-end Marlin (universal setup): R1CS -> index -> prove -> verify.

Mirrors the reference's marlin flow (zokrates_ark/src/marlin.rs:119-207):
one universal SRS serves every circuit below its degree bound; proofs are
checked by our own KZG/pairing oracle, and every corrupted variant must fail.
"""

import pytest

from zokrates_tpu.interp.interpreter import Interpreter
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.schemes import marlin
from zokrates_tpu.schemes.types import Proof

from test_groth16 import cube_prog, mul_pub_prog


def _drng(seed=1234567):
    state = [seed]

    def rand():
        state[0] = (state[0] * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return state[0] + 2

    return rand


class TestMarlin:
    def test_prove_verify_cube(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        wit = Interpreter().execute(prog, [3])
        srs = marlin.universal_setup("bn128", 64, rng=_drng())
        pk, vk = marlin.setup_with_srs(srs, r1cs)
        proof = marlin.prove(r1cs, pk, wit)
        assert proof.scheme == "marlin"
        assert marlin.verify(vk, proof)

    def test_prove_verify_public_input(self):
        prog = mul_pub_prog()
        r1cs = r1cs_from_prog(prog)
        wit = Interpreter().execute(prog, [7, 6])
        srs = marlin.universal_setup("bn128", 64, rng=_drng(99))
        pk, vk = marlin.setup_with_srs(srs, r1cs)
        proof = marlin.prove(r1cs, pk, wit)
        assert marlin.verify(vk, proof)

        # tampered public input must fail
        bad = Proof.from_json(proof.to_json())
        v = int(bad.inputs[0], 16)
        bad.inputs[0] = "0x" + format(v + 1, "064x")
        assert not marlin.verify(vk, bad)

    def test_corrupted_proof_fails(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        wit = Interpreter().execute(prog, [3])
        srs = marlin.universal_setup("bn128", 64, rng=_drng(7))
        pk, vk = marlin.setup_with_srs(srs, r1cs)
        proof = marlin.prove(r1cs, pk, wit)

        # corrupt an evaluation
        bad = Proof.from_json(proof.to_json())
        v = int(bad.points["evals_beta"]["z_a"], 16)
        bad.points["evals_beta"]["z_a"] = "0x" + format(v ^ 1, "064x")
        assert not marlin.verify(vk, bad)

        # corrupt t_beta
        bad = Proof.from_json(proof.to_json())
        v = int(bad.points["t_beta"], 16)
        bad.points["t_beta"] = "0x" + format(v ^ 1, "064x")
        assert not marlin.verify(vk, bad)

    def test_srs_too_small(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        srs = marlin.universal_setup("bn128", 8, rng=_drng(3))
        with pytest.raises(ValueError, match="universal SRS degree"):
            marlin.setup_with_srs(srs, r1cs)


class TestMarlinZK:
    def test_proofs_are_randomized(self):
        """zk masks: two proofs of the same witness reveal different
        evaluations and commitments (the round-1 polynomials carry fresh
        v_H multiples + hiding blinders each time)."""
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        wit = Interpreter().execute(prog, [3])
        srs = marlin.universal_setup("bn128", 64, rng=_drng(5))
        pk, vk = marlin.setup_with_srs(srs, r1cs)
        p1 = marlin.prove(r1cs, pk, wit)
        p2 = marlin.prove(r1cs, pk, wit)
        assert marlin.verify(vk, p1) and marlin.verify(vk, p2)
        assert p1.points["commitments"]["w"] != p2.points["commitments"]["w"]
        assert (
            p1.points["evals_beta"]["w"] != p2.points["evals_beta"]["w"]
            or p1.points["evals_beta"]["z_a"] != p2.points["evals_beta"]["z_a"]
        )

    def test_solidity_export(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        srs = marlin.universal_setup("bn128", 64, rng=_drng(11))
        pk, vk = marlin.setup_with_srs(srs, r1cs)
        from zokrates_tpu.schemes.solidity import export_solidity_verifier

        sol = export_solidity_verifier(vk)
        assert "contract Verifier" in sol and "INIT_STATE" in sol
        assert "verifyTx" in sol
