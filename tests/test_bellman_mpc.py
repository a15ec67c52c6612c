"""phase2/bellman MPC artifact interop: phase1radix + mpc.params formats,
radix-anchored ceremony initialize/contribute/verify/export.

Reference surface: zokrates_bellman/src/groth16.rs:103-159 (MpcBackend) and
the phase2 crate's MPCParameters/PublicKey serialization.
"""

import io

import pytest

from zokrates_tpu.interop import bellman_mpc as bm
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.schemes import groth16

from zokrates_tpu.interp.interpreter import Interpreter

from test_groth16 import cube_prog


@pytest.fixture(scope="module")
def radix():
    # cube circuit: 3 constraints + 2 instance (~one, ~out_0) -> domain 8
    return bm.generate_radix("bn128", 8)


@pytest.fixture(scope="module")
def r1cs():
    return r1cs_from_prog(cube_prog())


def test_radix_roundtrip(radix):
    buf = io.BytesIO()
    radix.write(buf)
    buf.seek(0)
    back = bm.Phase1Radix.read("bn128", buf, radix.n)
    assert back.alpha_g1 == radix.alpha_g1
    assert back.beta_g2 == radix.beta_g2
    assert back.coeffs_g1 == radix.coeffs_g1
    assert back.coeffs_g2 == radix.coeffs_g2
    assert back.h == radix.h
    assert buf.read() == b""  # consumed exactly


def test_point_codec_infinity():
    assert bm.g1_from_bytes("bn128", bm.g1_to_bytes("bn128", None)) is None
    assert bm.g2_from_bytes("bn128", bm.g2_to_bytes("bn128", None)) is None
    with pytest.raises(ValueError):
        bad = bytearray(bm.g1_to_bytes("bn128", None))
        bad[5] = 1  # infinity flag with nonzero body
        bm.g1_from_bytes("bn128", bytes(bad))


def test_ceremony_end_to_end(radix, r1cs):
    mpc = bm.initialize(r1cs, radix)
    assert mpc.contributions == []
    h1 = bm.contribute(mpc, entropy="alice")
    h2 = bm.contribute(mpc, entropy="bob")
    hb = bm.beacon(mpc, "deadbeef", iterations=4)
    assert len({h1, h2, hb}) == 3

    # container round-trip through the byte format
    buf = io.BytesIO()
    mpc.write(buf)
    buf.seek(0)
    back = bm.MPCParameters.read("bn128", buf)
    assert buf.read() == b""
    assert back.cs_hash == mpc.cs_hash
    assert len(back.contributions) == 3
    assert back.params.delta_g1 == mpc.params.delta_g1

    # chain verifies (on the deserialized copy)
    hashes = bm.verify(back, r1cs, radix)
    assert hashes == [
        __import__("hashlib").blake2b(
            c.to_bytes("bn128"), digest_size=64
        ).digest()
        for c in mpc.contributions
    ]

    # exported keys prove and verify a real statement
    pk, vk = bm.export_keypair(back, r1cs)
    wit = Interpreter().execute(cube_prog(), [3])
    proof = groth16.prove(r1cs, pk, wit)
    assert groth16.verify(vk, proof)


def test_verify_rejects_tampered_delta(radix, r1cs):
    mpc = bm.initialize(r1cs, radix)
    bm.contribute(mpc, entropy="alice")
    mpc.params.delta_g1 = mpc.params.delta_g1 * 7
    with pytest.raises(ValueError):
        bm.verify(mpc, r1cs, radix)


def test_verify_rejects_tampered_h_query(radix, r1cs):
    mpc = bm.initialize(r1cs, radix)
    bm.contribute(mpc, entropy="alice")
    mpc.params.h[0] = mpc.params.h[0] * 3
    with pytest.raises(ValueError):
        bm.verify(mpc, r1cs, radix)


def test_verify_rejects_wrong_circuit_hash(radix, r1cs):
    mpc = bm.initialize(r1cs, radix)
    mpc.cs_hash = b"\x00" * 64
    with pytest.raises(ValueError):
        bm.verify(mpc, r1cs, radix)
