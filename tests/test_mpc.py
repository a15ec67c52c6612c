"""MPC ceremony: contribute chain verifies, exported keys prove/verify,
tampered parameters are rejected."""

from tests.test_groth16 import cube_prog
from zokrates_tpu.interp.interpreter import Interpreter
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.schemes import groth16, mpc


class TestMPC:
    def test_ceremony_end_to_end(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        params = mpc.init(r1cs)
        h1 = mpc.contribute(params, "alice entropy")
        h2 = mpc.contribute(params, "bob entropy")
        assert h1 != h2
        assert len(params.contributions) == 2
        assert mpc.verify(params, r1cs)

        pk, vk = mpc.export_keys(params)
        w = Interpreter().execute(prog, [3])
        proof = groth16.prove(r1cs, pk, w)
        assert groth16.verify(vk, proof)

    def test_tampered_delta_rejected(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        params = mpc.init(r1cs)
        mpc.contribute(params)
        # malicious delta swap without updating queries
        params.pk.delta_g1 = params.pk.delta_g1 * 7
        assert not mpc.verify(params, r1cs)

    def test_tampered_query_rejected(self):
        from zokrates_tpu.ec.curve import PointG1, g1_group

        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        params = mpc.init(r1cs)
        mpc.contribute(params)
        grp = g1_group("bn128")
        hq = params.pk.h_query  # packed pk: property returns a fresh list
        pt = PointG1(grp, *hq[0])
        bad = pt * 3
        hq[0] = (bad.x, bad.y)
        params.pk.h_query = hq  # write back through the packing setter
        assert not mpc.verify(params, r1cs)
