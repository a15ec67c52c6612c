"""Multi-device kernels on the virtual 8-CPU mesh: sharded MSM + 4-step NTT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zokrates_tpu.ec.curve import g1_group
from zokrates_tpu.fields import params as FP
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
from zokrates_tpu.kernels.jec import curve_ops
from zokrates_tpu.kernels.ntt import domain_for_curve
from zokrates_tpu.parallel.msm_dist import msm_sharded
from zokrates_tpu.parallel.ntt_dist import FourStepNTT, ntt_sharded


def _mesh(axis, n=8):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, (axis,))


class TestShardedMSM:
    def test_matches_host(self, rng):
        grp = g1_group("bn128")
        ops = curve_ops(grp.q)
        mesh = _mesh("points", 8)
        n = 64
        g = grp.generator()
        pts = [g * rng.randrange(1, grp.r) for _ in range(n)]
        scalars = [rng.randrange(grp.r) for _ in range(n)]
        Px = ops.f.encode([p.x for p in pts])
        Py = ops.f.encode([p.y for p in pts])
        S = jnp.asarray(ints_to_limbs(scalars, n_limbs(grp.r)))
        with mesh:
            fn = msm_sharded(ops, mesh, "points", c=4)
            X, Y, Z = fn(Px, Py, S)
        got = ops.to_affine_ints((X[None], Y[None], Z[None]))[0]
        expect = grp.zero()
        for p, s in zip(pts, scalars):
            expect = expect + p * s
        assert got == (expect.x, expect.y)


class TestFourStepNTT:
    @pytest.mark.parametrize("n1,n2", [(16, 16), (8, 32)])
    def test_matches_single_device(self, n1, n2, rng):
        fp = FP.SCALAR_FIELDS["bn128"]
        fs = FourStepNTT(fp.p, n1, n2, fp.two_adic_root, fp.two_adicity)
        mesh = _mesh("dom", 8)
        n = n1 * n2
        xs = [rng.randrange(fp.p) for _ in range(n)]
        x = fs.ops.encode(xs).reshape(n1, n2, -1)

        with mesh:
            fn = ntt_sharded(fs, mesh, "dom")
            z = fn(x)
        got2d = fs.ops.decode(z)
        # Z[k1, k2] == A[k2*n1 + k1]
        dom = domain_for_curve("bn128", n)
        expect = dom.fft_ints(xs)
        got = [0] * n
        for k1 in range(n1):
            for k2 in range(n2):
                got[k2 * n1 + k1] = got2d[k1 * n2 + k2]
        assert got == expect

    def test_inverse_and_transposed_roundtrips(self, rng):
        from zokrates_tpu.parallel.ntt_dist import (
            intt_from_transposed,
            intt_to_transposed,
            ntt_from_transposed,
        )

        fp = FP.SCALAR_FIELDS["bn128"]
        n1, n2 = 16, 8
        fs = FourStepNTT(fp.p, n1, n2, fp.two_adic_root, fp.two_adicity)
        mesh = _mesh("dom", 8)
        xs = [rng.randrange(fp.p) for _ in range(n1 * n2)]
        x = fs.ops.encode(xs).reshape(n1, n2, -1)
        with mesh:
            Z = ntt_sharded(fs, mesh, "dom")(x)
            x2 = intt_from_transposed(fs, mesh, "dom")(Z)
            C = intt_to_transposed(fs, mesh, "dom")(x)
            x3 = ntt_from_transposed(fs, mesh, "dom")(C)
        d = fs.ops.decode
        assert d(x2) == d(x)
        assert d(x3) == d(x)
        # transposed layout: C[j1, j2] == ifft(x)[j2*n1 + j1]
        dom = domain_for_curve("bn128", n1 * n2)
        coeffs = dom.ifft_ints(xs)
        got = d(C)
        assert all(
            got[j1 * n2 + j2] == coeffs[j2 * n1 + j1]
            for j1 in range(n1)
            for j2 in range(n2)
        )


class TestShardedGroth16:
    def test_proof_equals_single_device(self, rng):
        """Full sharded prove on the 8-device mesh: bit-identical proof to
        schemes/groth16.prove under the same randomness, and verifies."""
        import random

        from zokrates_tpu.interp.interpreter import Interpreter
        from zokrates_tpu.ir.r1cs import r1cs_from_prog
        from zokrates_tpu.lang.compile import compile_source
        from zokrates_tpu.parallel.groth16 import sharded_prover
        from zokrates_tpu.schemes import groth16

        src = (
            "def main(private field x0) -> field {\n"
            "    field mut x = x0;\n"
            "    for u32 i in 0..70 { x = x * x + 1; }\n"
            "    return x;\n"
            "}"
        )
        prog = compile_source(src, curve="bn128").prog
        r1cs = r1cs_from_prog(prog)
        w = Interpreter().execute(prog, [3])
        pk, vk = groth16.setup(r1cs)
        seq = [rng.randrange(1, 2**200) for _ in range(4)]
        it1, it2 = iter(seq), iter(seq)
        p1 = groth16.prove(r1cs, pk, w, rng=lambda: next(it1))
        mesh = _mesh("shard", 8)
        sp = sharded_prover(r1cs, pk, mesh)
        p2 = sp.prove(w, rng=lambda: next(it2))
        assert p1.points == p2.points and p1.inputs == p2.inputs
        assert groth16.verify(vk, p2)
