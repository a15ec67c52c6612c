"""KZG10 commitments: open/verify, batching, forgery rejection."""

import random

import pytest

from zokrates_tpu.schemes import kzg


class TestKZG:
    def setup_method(self, m):
        self.rng = random.Random(11)
        self.srs = kzg.universal_setup("bn128", 16, rng=lambda: self.rng.randrange(1, 2**200))
        from zokrates_tpu.fields import params as P

        self.r = P.SCALAR_FIELDS["bn128"].p

    def test_open_verify(self):
        coeffs = [self.rng.randrange(self.r) for _ in range(9)]
        C = kzg.commit(self.srs, coeffs)
        z = self.rng.randrange(self.r)
        v, proof = kzg.open_single(self.srs, coeffs, z)
        assert kzg.verify_single(self.srs, C, z, v, proof)
        assert not kzg.verify_single(self.srs, C, z, (v + 1) % self.r, proof)

    def test_batch(self):
        polys = [
            [self.rng.randrange(self.r) for _ in range(self.rng.randrange(2, 12))]
            for _ in range(3)
        ]
        cs = [kzg.commit(self.srs, pc) for pc in polys]
        z = self.rng.randrange(self.r)
        gamma = self.rng.randrange(1, self.r)
        values, proof, _ = kzg.open_batch(self.srs, polys, z, gamma)
        assert kzg.verify_batch(self.srs, cs, z, values, proof, gamma)
        bad = list(values)
        bad[1] = (bad[1] + 1) % self.r
        assert not kzg.verify_batch(self.srs, cs, z, bad, proof, gamma)

    def test_degree_bound(self):
        with pytest.raises(ValueError):
            kzg.commit(self.srs, [1] * 40)


class TestHidingKZG:
    def test_hiding_commit_open_verify(self, rng):
        from zokrates_tpu.fields import params as P

        curve = "bn128"
        r = P.SCALAR_FIELDS[curve].p
        srs = kzg.universal_setup(curve, 8, rng=lambda: rng.randrange(1, r))
        p1 = [rng.randrange(r) for _ in range(5)]
        p2 = [rng.randrange(r) for _ in range(7)]
        b1 = kzg.rand_blinder(curve, lambda: rng.randrange(r))
        c1 = kzg.commit_hiding(srs, p1, b1)
        c2 = kzg.commit(srs, p2)  # non-hiding mixes into the same batch
        z = rng.randrange(r)
        gamma = rng.randrange(1, r)
        values, proof, rv = kzg.open_batch(
            srs, [p1, p2], z, gamma, blinders=[b1, None]
        )
        assert kzg.verify_batch(srs, [c1, c2], z, values, proof, gamma, rv)
        # tampered evaluation fails
        bad = list(values)
        bad[0] = (bad[0] + 1) % r
        assert not kzg.verify_batch(srs, [c1, c2], z, bad, proof, gamma, rv)
        # dropping the blinding correction fails
        assert not kzg.verify_batch(srs, [c1, c2], z, values, proof, gamma, 0)
