"""GM17 end-to-end: SAP reduction + prove/verify + forgery rejection."""

import pytest

from tests.test_groth16 import cube_prog, mul_pub_prog
from zokrates_tpu.interp.interpreter import Interpreter
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.schemes import gm17


class TestGM17:
    def test_prove_verify(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        pk, vk = gm17.setup(r1cs)
        w = Interpreter().execute(prog, [3])
        proof = gm17.prove(r1cs, pk, w)
        assert gm17.verify(vk, proof)

    def test_wrong_input_rejected(self):
        from zokrates_tpu.schemes.types import fr_to_json

        prog = mul_pub_prog()
        r1cs = r1cs_from_prog(prog)
        pk, vk = gm17.setup(r1cs)
        w = Interpreter().execute(prog, [6, 7])
        proof = gm17.prove(r1cs, pk, w)
        assert gm17.verify(vk, proof)
        proof.inputs[1] = fr_to_json(43, "bn128")
        assert not gm17.verify(vk, proof)

    def test_tampered_proof_rejected(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        pk, vk = gm17.setup(r1cs)
        w = Interpreter().execute(prog, [5])
        proof = gm17.prove(r1cs, pk, w)
        a = proof.points["a"]
        proof.points["a"] = proof.points["c"]
        assert not gm17.verify(vk, proof)
        proof.points["a"] = a
        assert gm17.verify(vk, proof)


def test_gm17_solidity_export():
    prog = cube_prog()
    r1cs = r1cs_from_prog(prog)
    pk, vk = gm17.setup(r1cs)
    from zokrates_tpu.schemes.solidity import export_solidity_verifier

    sol = export_solidity_verifier(vk)
    assert "ecTwistAdd" in sol  # G2 addition library (no EVM precompile)
    assert "h_gamma" in sol and "pairingProd4" in sol and "verifyTx" in sol
