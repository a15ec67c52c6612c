"""End-to-end Groth16: hand-built R1CS circuits -> witness -> setup ->
prove (device MSM/NTT) -> verify (pairing oracle).

This is the minimum end-to-end slice of SURVEY.md §7: every proof must
verify, and every forged/corrupted variant must fail.
"""

import pytest

from zokrates_tpu.interp.interpreter import Interpreter, UnsatisfiedConstraint
from zokrates_tpu.ir.program import (
    Constraint,
    Directive,
    LinComb,
    Parameter,
    Prog,
    QuadComb,
    Solver,
    var_new,
    var_public,
)
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.schemes import groth16


def cube_prog(curve="bn128"):
    """y == x**3 + x + 5 (the classic toy circuit).

    private x; public output y.
      t1 = x*x ; t2 = t1*x ; out = t2 + x + 5
    """
    x = var_new(0)
    t1 = var_new(1)
    t2 = var_new(2)
    out = var_public(0)
    stmts = [
        Constraint(QuadComb(LinComb.from_var(x), LinComb.from_var(x)), LinComb.from_var(t1)),
        Constraint(QuadComb(LinComb.from_var(t1), LinComb.from_var(x)), LinComb.from_var(t2)),
        Constraint(
            QuadComb(LinComb.one(), LinComb.from_var(t2) + LinComb.from_var(x) + LinComb.constant(5)),
            LinComb.from_var(out),
        ),
    ]
    return Prog(curve=curve, arguments=[Parameter(x, private=True)], return_count=1, statements=stmts)


def mul_pub_prog(curve="bn128"):
    """public a, private b, output a*b."""
    a = var_new(0)
    b = var_new(1)
    out = var_public(0)
    stmts = [
        Constraint(QuadComb(LinComb.from_var(a), LinComb.from_var(b)), LinComb.from_var(out)),
    ]
    return Prog(
        curve=curve,
        arguments=[Parameter(a, private=False), Parameter(b, private=True)],
        return_count=1,
        statements=stmts,
    )


class TestInterpreter:
    def test_cube(self):
        prog = cube_prog()
        w = Interpreter().execute(prog, [3])
        assert w.return_values() == [3**3 + 3 + 5]

    def test_directive_bits(self):
        # decompose x into 4 bits, assert the first bit (MSB) is 0
        x = var_new(0)
        bits = [var_new(1 + i) for i in range(4)]
        prog = Prog(
            curve="bn128",
            arguments=[Parameter(x)],
            return_count=0,
            statements=[
                Directive([QuadComb.from_lin(LinComb.from_var(x))], bits, Solver("Bits", 4)),
                Constraint(QuadComb.from_lin(LinComb.from_var(bits[0])), LinComb()),
            ],
        )
        w = Interpreter().execute(prog, [5])
        assert [w[b] for b in bits] == [0, 1, 0, 1]
        with pytest.raises(UnsatisfiedConstraint):
            Interpreter().execute(prog, [9])  # MSB set

    def test_condition_eq_solver(self):
        from zokrates_tpu.interp.interpreter import execute_solver
        from zokrates_tpu.fields.field import Bn128Field as F

        assert execute_solver(Solver("ConditionEq"), [0], F) == [0, 1]
        out = execute_solver(Solver("ConditionEq"), [7], F)
        assert out[0] == 1 and out[1] == pow(7, -1, F.P)


class TestR1CS:
    def test_dense_layout(self):
        prog = mul_pub_prog()
        r1cs = r1cs_from_prog(prog)
        # instance: one, a(public), out ; witness: b
        assert r1cs.num_instance == 3
        assert r1cs.num_witness == 1
        w = Interpreter().execute(prog, [6, 7])
        z = r1cs.full_assignment(w)
        assert z == [1, 6, 42, 7]
        assert r1cs.check(z, prog.field.P)


class TestGroth16:
    @pytest.mark.parametrize("curve", ["bn128", "bls12_381"])
    def test_prove_verify(self, curve):
        prog = cube_prog(curve)
        r1cs = r1cs_from_prog(prog)
        pk, vk = groth16.setup(r1cs)
        w = Interpreter().execute(prog, [3])
        proof = groth16.prove(r1cs, pk, w)
        assert groth16.verify(vk, proof)

    def test_wrong_public_input_rejected(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        pk, vk = groth16.setup(r1cs)
        w = Interpreter().execute(prog, [3])
        proof = groth16.prove(r1cs, pk, w)
        # tamper with the public input
        from zokrates_tpu.schemes.types import fr_to_json

        proof.inputs[0] = fr_to_json(36, "bn128")
        assert not groth16.verify(vk, proof)

    def test_tampered_proof_rejected(self):
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        pk, vk = groth16.setup(r1cs)
        w = Interpreter().execute(prog, [4])
        proof = groth16.prove(r1cs, pk, w)
        good_a = proof.points["a"]
        proof.points["a"] = proof.points["c"]
        assert not groth16.verify(vk, proof)
        proof.points["a"] = good_a
        assert groth16.verify(vk, proof)

    def test_public_arg_circuit(self):
        prog = mul_pub_prog()
        r1cs = r1cs_from_prog(prog)
        pk, vk = groth16.setup(r1cs)
        w = Interpreter().execute(prog, [6, 7])
        proof = groth16.prove(r1cs, pk, w)
        # public inputs serialized with the proof: a=6 then out=42
        from zokrates_tpu.schemes.types import fr_from_json

        assert [fr_from_json(x, "bn128") for x in proof.inputs] == [6, 42]
        assert groth16.verify(vk, proof)

    def test_prove_batch(self):
        """Multi-proof batch axis: B witnesses through one vmapped pipeline;
        every proof verifies, wrong inputs still reject."""
        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        pk, vk = groth16.setup(r1cs)
        xs = [2, 3, 11]
        ws = [Interpreter().execute(prog, [x]) for x in xs]
        proofs = groth16.prove_batch(r1cs, pk, ws)
        assert len(proofs) == 3
        from zokrates_tpu.schemes.types import fr_from_json, fr_to_json

        for x, proof in zip(xs, proofs):
            assert fr_from_json(proof.inputs[0], "bn128") == x**3 + x + 5
            assert groth16.verify(vk, proof)
        # a batch proof is a normal proof: cross-tampering rejects
        proofs[0].inputs[0] = fr_to_json(999, "bn128")
        assert not groth16.verify(vk, proofs[0])

    def test_prove_batch_matches_prove(self):
        """With a deterministic rng the batched prover emits byte-identical
        proofs to the sequential one."""
        prog = mul_pub_prog()
        r1cs = r1cs_from_prog(prog)
        pk, vk = groth16.setup(r1cs)
        ws = [Interpreter().execute(prog, [a, b]) for a, b in [(2, 9), (5, 5)]]

        def fixed_rng():
            return 1234567

        seq = [groth16.prove(r1cs, pk, w, rng=fixed_rng) for w in ws]
        bat = groth16.prove_batch(r1cs, pk, ws, rng=fixed_rng)
        for pa, pb in zip(seq, bat):
            assert pa.points == pb.points
            assert pa.inputs == pb.inputs
            assert groth16.verify(vk, pb)

    def test_proof_json_roundtrip(self):
        import json

        prog = cube_prog()
        r1cs = r1cs_from_prog(prog)
        pk, vk = groth16.setup(r1cs)
        w = Interpreter().execute(prog, [2])
        proof = groth16.prove(r1cs, pk, w)
        blob = json.dumps(proof.to_json())
        from zokrates_tpu.schemes.types import Proof, VerificationKey

        proof2 = Proof.from_json(json.loads(blob))
        vk2 = VerificationKey.from_json(json.loads(json.dumps(vk.to_json())))
        assert groth16.verify(vk2, proof2)


class TestWitnessSplit:
    """Window-split planning (device tiers + native host windows)."""

    def _cfg(self):
        from zokrates_tpu.kernels.msm_sorted import MSMConfig

        return MSMConfig(c=8, M1=1024, R=4, lw2=128)

    def test_sha256_profile_host_split(self):
        from zokrates_tpu.schemes.groth16 import _split_with_host

        nnz = [12435, 8, 8, 8, 6] + [0] * 27
        w0, w1, Ks, hw0, hw1 = _split_with_host(nnz, 32, self._cfg(), 32768, True)
        # device: window 0 at its 16384 tier; host: windows 1..4
        assert (w0, w1, Ks, hw0, hw1) == (0, 1, 16384, 1, 5)

    def test_no_native_falls_back_to_device_split(self):
        from zokrates_tpu.schemes.groth16 import _split_with_host

        nnz = [12435, 8, 8, 8, 6] + [0] * 27
        w0, w1, Ks, hw0, hw1 = _split_with_host(nnz, 32, self._cfg(), 32768, False)
        assert (hw0, hw1) == (0, 0) and w1 >= 5 and Ks >= 8

    def test_uniform_scalars_stay_on_device(self):
        from zokrates_tpu.schemes.groth16 import _split_with_host

        nnz = [32000] * 32
        w0, w1, Ks, hw0, hw1 = _split_with_host(nnz, 32, self._cfg(), 32768, True)
        assert (hw0, hw1) == (0, 0) and w1 == 32

    def test_host_cap_respected(self):
        from zokrates_tpu.schemes.groth16 import (
            _HOST_SPARSE_CAP,
            _split_with_host,
        )

        # tail windows sum beyond the cap: only the affordable suffix
        # goes to the host
        nnz = [30000, 5000, 3000, 3000, 900, 200, 40, 8] + [0] * 24
        w0, w1, Ks, hw0, hw1 = _split_with_host(nnz, 32, self._cfg(), 32768, True)
        if hw1 > hw0:
            assert sum(nnz[hw0:hw1]) <= _HOST_SPARSE_CAP
            assert max(nnz[w0:w1] or [0]) <= Ks
