"""Nova IVC folding: multi-step chains fold into one relaxed instance whose
final witness must satisfy the relaxed R1CS (reference flow:
zokrates_bellperson/src/nova.rs prove_step/verify)."""

import pytest

from zokrates_tpu.ir.program import (
    Constraint,
    LinComb,
    Parameter,
    Prog,
    QuadComb,
    var_new,
    var_public,
)
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.schemes import nova


def square_step_prog(curve="pallas"):
    """State transition z' = z*z + z (one public arg, one return)."""
    a = var_new(0)
    t = var_new(1)
    out = var_public(0)
    stmts = [
        Constraint(QuadComb(LinComb.from_var(a), LinComb.from_var(a)), LinComb.from_var(t)),
        Constraint(
            QuadComb(LinComb.one(), LinComb.from_var(t) + LinComb.from_var(a)),
            LinComb.from_var(out),
        ),
    ]
    return Prog(curve=curve, arguments=[Parameter(a, private=False)], return_count=1, statements=stmts)


def private_arg_prog(curve="pallas"):
    a = var_new(0)
    out = var_public(0)
    stmts = [Constraint(QuadComb(LinComb.from_var(a), LinComb.from_var(a)), LinComb.from_var(out))]
    return Prog(curve=curve, arguments=[Parameter(a, private=True)], return_count=1, statements=stmts)


class TestNova:
    @pytest.mark.parametrize("curve", ["pallas", "vesta"])
    def test_ivc_chain(self, curve):
        prog = square_step_prog(curve)
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        proof = nova.prove(prog, r1cs, params, [3], num_steps=4)
        # recompute the expected final state on the host
        from zokrates_tpu.fields import params as P

        p = P.SCALAR_FIELDS[curve].p
        z = 3
        for _ in range(4):
            z = (z * z + z) % p
        assert proof.zN == [z]
        assert nova.verify(r1cs, params, proof)

    def test_tampered_state_fails(self):
        prog = square_step_prog()
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        proof = nova.prove(prog, r1cs, params, [2], num_steps=3)
        proof.zN[0] ^= 1
        assert not nova.verify(r1cs, params, proof)

    def test_tampered_step_fails(self):
        prog = square_step_prog()
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        proof = nova.prove(prog, r1cs, params, [2], num_steps=3)
        proof.steps[1].x[0] = (proof.steps[1].x[0] + 1) % 7
        assert not nova.verify(r1cs, params, proof)

    def test_tampered_final_witness_fails(self):
        prog = square_step_prog()
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        proof = nova.prove(prog, r1cs, params, [2], num_steps=2)
        proof.final_W[0] = (proof.final_W[0] + 1)
        assert not nova.verify(r1cs, params, proof)

    def test_private_args_rejected(self):
        prog = private_arg_prog()
        r1cs = r1cs_from_prog(prog)
        with pytest.raises(nova.NovaError, match="private"):
            nova.setup(prog, r1cs)

    def test_resume_matches_direct(self):
        """prove(2) then resume(2) must equal prove(4) bit-for-bit (same
        transcript replay), mirroring `nova prove --continue`."""
        prog = square_step_prog()
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        direct = nova.prove(prog, r1cs, params, [5], num_steps=4)
        part = nova.prove(prog, r1cs, params, [5], num_steps=2)
        resumed = nova.prove(prog, r1cs, params, [5], num_steps=2, resume=part)
        assert resumed.num_steps == 4
        assert resumed == direct
        assert nova.verify(r1cs, params, resumed)

    def test_compress_verifies(self):
        prog = square_step_prog()
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        proof = nova.prove(prog, r1cs, params, [2], num_steps=1)
        assert nova.verify_compressed(
            r1cs, params, nova.compress(r1cs, params, proof)
        )


class TestNovaCompress:
    def test_compress_roundtrip(self):
        prog = square_step_prog()
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        proof = nova.prove(prog, r1cs, params, [3], num_steps=3)
        cproof = nova.compress(r1cs, params, proof)
        assert nova.verify_compressed(r1cs, params, cproof)
        # succinct: no witness vectors ship with the compressed proof
        assert not hasattr(cproof, "W_f") and not hasattr(cproof, "E_f")
        assert len(cproof.sc1) and len(cproof.sc2)

    def test_compress_tamper_fails(self):
        prog = square_step_prog()
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        proof = nova.prove(prog, r1cs, params, [2], num_steps=2)
        cproof = nova.compress(r1cs, params, proof)
        from zokrates_tpu.fields import params as P

        p = P.SCALAR_FIELDS["pallas"].p
        cproof.ipa_w.w0 = (cproof.ipa_w.w0 + 1) % p
        assert not nova.verify_compressed(r1cs, params, cproof)

    def test_compress_tampered_eval_fails(self):
        prog = square_step_prog()
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        proof = nova.prove(prog, r1cs, params, [2], num_steps=2)
        cproof = nova.compress(r1cs, params, proof)
        from zokrates_tpu.fields import params as P

        p = P.SCALAR_FIELDS["pallas"].p
        vA, vB, vC, vE = cproof.evals
        cproof.evals = ((vA + 1) % p, vB, vC, vE)
        assert not nova.verify_compressed(r1cs, params, cproof)

    def test_compress_tampered_state_fails(self):
        prog = square_step_prog()
        r1cs = r1cs_from_prog(prog)
        params = nova.setup(prog, r1cs)
        proof = nova.prove(prog, r1cs, params, [2], num_steps=2)
        cproof = nova.compress(r1cs, params, proof)
        cproof.zN = [123456]
        assert not nova.verify_compressed(r1cs, params, cproof)
