"""Device kernel tests: batched EC ops, MSM, NTT — all vs host oracles."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zokrates_tpu.ec.curve import PointG1, g1_group
from zokrates_tpu.fields import params as P
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
from zokrates_tpu.kernels.jec import curve_ops
from zokrates_tpu.kernels.msm import msm_host
from zokrates_tpu.kernels.ntt import domain_for_curve


def _ops(curve="bn128"):
    grp = g1_group(curve)
    return grp, curve_ops(grp.q, grp.b)


class TestJacobianOps:
    def test_add_double_vs_host(self, rng):
        grp, ops = _ops()
        g = grp.generator()
        pts_a = [g * rng.randrange(1, grp.r) for _ in range(8)]
        pts_b = [g * rng.randrange(1, grp.r) for _ in range(8)]
        A = ops.from_points(pts_a)
        B = ops.from_points(pts_b)
        out = ops.to_affine_ints(ops.add_jit(A, B))
        expect = [a + b for a, b in zip(pts_a, pts_b)]
        for o, e in zip(out, expect):
            assert o == (e.x, e.y)
        out2 = ops.to_affine_ints(ops.double_jit(A))
        for o, e in zip(out2, [a + a for a in pts_a]):
            assert o == (e.x, e.y)

    def test_add_edge_cases(self, rng):
        grp, ops = _ops()
        g = grp.generator()
        p1 = g * 5
        # P + (-P) = inf ; P + P (equal inputs) = 2P ; P + inf ; inf + P
        pts_a = [p1, p1, p1, grp.zero()]
        pts_b = [-p1, p1, grp.zero(), p1]
        A = ops.from_points(pts_a)
        B = ops.from_points(pts_b)
        out = ops.to_affine_ints(ops.add_jit(A, B))
        assert out[0] is None
        assert out[1] == ((p1 + p1).x, (p1 + p1).y)
        assert out[2] == (p1.x, p1.y)
        assert out[3] == (p1.x, p1.y)

    def test_mixed_add(self, rng):
        grp, ops = _ops()
        g = grp.generator()
        pts_a = [g * rng.randrange(1, grp.r) for _ in range(4)]
        pts_b = [g * rng.randrange(1, grp.r) for _ in range(4)]
        A = ops.from_points(pts_a)
        Qx = ops.f.encode([p.x for p in pts_b])
        Qy = ops.f.encode([p.y for p in pts_b])
        out = ops.to_affine_ints(ops.mixed_add_jit(A, Qx, Qy))
        for o, e in zip(out, [a + b for a, b in zip(pts_a, pts_b)]):
            assert o == (e.x, e.y)

    def test_tree_reduce(self, rng):
        grp, ops = _ops()
        g = grp.generator()
        ks = [rng.randrange(1, grp.r) for _ in range(7)]  # odd count
        pts = [g * k for k in ks]
        A = ops.from_points(pts)
        out = ops.to_affine_ints(ops.tree_reduce_jit(A))[0]
        expect = g * (sum(ks) % grp.r)
        assert out == (expect.x, expect.y)


class TestMSM:
    @pytest.mark.parametrize("curve", ["bn128", "bls12_377"])
    @pytest.mark.parametrize("c", [4, 8])
    def test_msm_matches_host(self, curve, c, rng):
        grp, ops = _ops(curve)
        g = grp.generator()
        n = 33
        pts = [g * rng.randrange(1, grp.r) for _ in range(n)]
        scalars = [rng.randrange(0, grp.r) for _ in range(n)]
        got = msm_host(ops, pts, scalars, c=c)
        expect = grp.zero()
        for p, s in zip(pts, scalars):
            expect = expect + p * s
        assert got == expect

    def test_msm_zero_scalars(self, rng):
        grp, ops = _ops()
        g = grp.generator()
        pts = [g * (i + 1) for i in range(8)]
        got = msm_host(ops, pts, [0] * 8, c=8)
        assert got.infinity

    def test_msm_single(self):
        grp, ops = _ops()
        g = grp.generator()
        got = msm_host(ops, [g], [12345], c=8)
        assert got == g * 12345


class TestNTT:
    def _naive_ntt(self, xs, omega, p):
        n = len(xs)
        return [
            sum(xs[j] * pow(omega, i * j, p) for j in range(n)) % p for i in range(n)
        ]

    @pytest.mark.parametrize("n", [4, 16, 64])
    def test_fft_matches_naive(self, n, rng):
        dom = domain_for_curve("bn128", n)
        xs = [rng.randrange(dom.p) for _ in range(n)]
        got = dom.fft_ints(xs)
        expect = self._naive_ntt(xs, dom.omega, dom.p)
        assert got == expect

    def test_ifft_roundtrip(self, rng):
        dom = domain_for_curve("bn128", 32)
        xs = [rng.randrange(dom.p) for _ in range(32)]
        a = dom.ops.encode(xs)
        back = dom.ops.decode(dom.ifft(dom.fft(a)))
        assert back == xs

    def test_coset_roundtrip(self, rng):
        dom = domain_for_curve("bn128", 16)
        g = P.SCALAR_FIELDS["bn128"].smallest_nonresidue
        xs = [rng.randrange(dom.p) for _ in range(16)]
        a = dom.ops.encode(xs)
        back = dom.ops.decode(dom.coset_ifft(dom.coset_fft(a, g), g))
        assert back == xs

    def test_poly_mul_via_fft(self, rng):
        # multiply two degree-7 polys on a 16-domain; compare to schoolbook
        dom = domain_for_curve("bn128", 16)
        p = dom.p
        a_c = [rng.randrange(p) for _ in range(8)]
        b_c = [rng.randrange(p) for _ in range(8)]
        A = dom.ops.encode(a_c + [0] * 8)
        B = dom.ops.encode(b_c + [0] * 8)
        prod_evals = dom.ops.mul(dom.fft(A), dom.fft(B))
        got = dom.ops.decode(dom.ifft(prod_evals))
        expect = [0] * 16
        for i, ai in enumerate(a_c):
            for j, bj in enumerate(b_c):
                expect[i + j] = (expect[i + j] + ai * bj) % p
        assert got == expect

    def test_vesta_domain(self, rng):
        # pasta curves also have 2-adic domains
        dom = domain_for_curve("vesta", 8)
        xs = [rng.randrange(dom.p) for _ in range(8)]
        assert dom.fft_ints(xs) == self._naive_ntt(xs, dom.omega, dom.p)


class TestElementwisePallas:
    """Elementwise Montgomery mul + lazy-sum reduction kernels
    (pallas_field.emul / ereduce_wide) vs the XLA jfield ops."""

    def test_emul_shared_and_full(self):
        import numpy as np
        from zokrates_tpu.fields import params as P
        from zokrates_tpu.fields.jfield import field_ops
        from zokrates_tpu.kernels.pallas_field import emul

        p = P.SCALAR_FIELDS["bn128"].p
        f = field_ops(p)
        rng = np.random.default_rng(11)
        B, L = 2, 1500
        a = f.encode([int(v) for v in rng.integers(0, 2**62, size=B * L)])
        a = a.reshape(B, L, -1)
        b = f.encode([int(v) for v in rng.integers(0, 2**62, size=L)])
        assert f.decode(emul(p, a, b, interpret=True)) == f.decode(
            f.mul_(a, b[None])
        )
        b3 = f.encode(
            [int(v) for v in rng.integers(0, 2**62, size=B * L)]
        ).reshape(B, L, -1)
        assert f.decode(emul(p, a, b3, interpret=True)) == f.decode(
            f.mul_(a, b3)
        )

    def test_ereduce_wide(self):
        import jax.numpy as jnp
        import numpy as np
        from zokrates_tpu.fields import params as P
        from zokrates_tpu.fields.jfield import field_ops
        from zokrates_tpu.kernels.pallas_field import ereduce_wide

        p = P.SCALAR_FIELDS["bn128"].p
        f = field_ops(p)
        rng = np.random.default_rng(12)
        t = jnp.asarray(
            rng.integers(0, 1 << 31, size=(2, 900, f.nl), dtype=np.uint32)
        )
        assert f.decode(ereduce_wide(p, t, interpret=True), mont=True) == f.decode(
            f.reduce_wide_(t), mont=True
        )

    def test_mulacc_walk_matvec(self):
        """Fused mulacc-walk sparse matvec == gather+mul+segment_sum."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from zokrates_tpu.fields import params as P
        from zokrates_tpu.fields.jfield import field_ops
        from zokrates_tpu.ir.r1cs_device import (
            _MULACC_R,
            _MULACC_S,
        )
        from zokrates_tpu.kernels.pallas_field import ereduce_wide, mulacc_walk

        p = P.SCALAR_FIELDS["bn128"].p
        f = field_ops(p)
        nl = f.nl
        rng = np.random.default_rng(21)
        n_rows, m, L, B = 64, 40, 3000, 2
        rows = np.sort(rng.integers(0, n_rows, size=L)).astype(np.int64)
        cols = rng.integers(0, m, size=L).astype(np.int32)
        coeff_ints = [
            int.from_bytes(rng.bytes(32), "big") % (p - 1) + 1 for _ in range(L)
        ]
        coeff = np.asarray(
            jax.device_get(f.to_mont(f.encode(coeff_ints, mont=False)))
        )
        z_ints = [
            int.from_bytes(rng.bytes(32), "big") % p for _ in range(B * m)
        ]
        Z_mont = f.to_mont(f.encode(z_ints, mont=False)).reshape(B, m, nl)

        # reference: gather + mul + segment_sum + reduce
        vals = f.mul_(coeff[None], jnp.take(Z_mont, cols, axis=1))
        import jax.ops

        ref = f.reduce_wide_(
            jax.vmap(
                lambda v: jax.ops.segment_sum(
                    v, rows, num_segments=n_rows, indices_are_sorted=True
                )
            )(vals)
        )

        # walk layout (mirrors ir/r1cs_device.build_mulacc_walk)
        M = _MULACC_S * 128
        R = _MULACC_R
        K = -(-(-(-L // M)) // R) * R
        Lp = M * K
        rows_pad = np.concatenate([rows, np.full(Lp - L, n_rows, np.int64)])
        cols_pad = np.concatenate([cols, np.zeros(Lp - L, np.int32)])
        coeff_pad = np.concatenate([coeff, np.zeros((Lp - L, nl), coeff.dtype)])
        nxt = np.concatenate([rows_pad[1:], np.asarray([-1], np.int64)])
        flush = rows_pad != nxt
        flush |= (np.arange(Lp) % K) == (K - 1)
        pos = np.nonzero(flush)[0].astype(np.int32)
        seg = rows_pad[pos].astype(np.int32)
        cw = coeff_pad.reshape(_MULACC_S, 128, K, nl).transpose(2, 3, 0, 1)
        fl = (
            flush.astype(np.uint32)
            .reshape(_MULACC_S, 128, K)
            .transpose(2, 0, 1)
            .reshape(K // R, R, _MULACC_S, 128)
        )
        zg = jnp.take(Z_mont, jnp.asarray(cols_pad), axis=1)
        zw = zg.reshape(B, _MULACC_S, 128, K, nl).transpose(0, 3, 4, 1, 2)
        out = mulacc_walk(
            p, zw, jnp.asarray(np.ascontiguousarray(cw)),
            jnp.asarray(np.ascontiguousarray(fl)), R, interpret=True,
        )
        OT = out.transpose(0, 3, 4, 1, 2).reshape(B, Lp, nl)
        part = ereduce_wide(p, jnp.take(OT, jnp.asarray(pos), axis=1),
                            interpret=True)
        sums = jax.vmap(
            lambda v: jax.ops.segment_sum(
                v, seg, num_segments=n_rows + 1, indices_are_sorted=True
            )
        )(part)[:, :n_rows]
        got = ereduce_wide(p, sums, interpret=True)
        assert f.decode(got, mont=True) == f.decode(ref, mont=True)
