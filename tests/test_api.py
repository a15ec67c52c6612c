"""In-process provider API (zokrates_tpu.api), mirroring the reference's
zokrates_js ZoKratesProvider surface (index.d.ts:76-107)."""

import pytest

from zokrates_tpu.api import ZoKratesProvider, initialize

SRC = "def main(private field x, field y) -> field {\n    return x * x + y;\n}\n"


@pytest.fixture(scope="module")
def zk():
    return initialize(curve="bn128", scheme="g16")


@pytest.fixture(scope="module")
def artifacts(zk):
    return zk.compile(SRC)


def test_compile_and_witness(zk, artifacts):
    res = zk.compute_witness(artifacts, ["3", "4"])
    assert res.output == "13"
    assert res.witness_bytes(artifacts.prog.field)  # binary export


def test_full_proof_roundtrip(zk, artifacts):
    res = zk.compute_witness(artifacts, ["3", "4"])
    keypair = zk.setup(artifacts.prog)
    proof = zk.generate_proof(artifacts.prog, res.witness, keypair.pk)
    assert zk.verify(keypair.vk, proof)
    assert zk.verify(keypair.vk.to_json(), proof.to_json())  # JSON forms
    sol = zk.export_solidity_verifier(keypair.vk)
    assert "contract Verifier" in sol
    tokens = zk.format_proof(proof)
    assert tokens


def test_with_options(zk):
    gm = zk.with_options(scheme="gm17")
    assert gm.scheme == "gm17" and gm.curve == "bn128"


def test_multi_module_sources(zk):
    helper = "def sq(field x) -> field {\n    return x * x;\n}\n"
    main = (
        'from "./helper" import sq;\n'
        "def main(field x) -> field {\n    return sq(x);\n}\n"
    )
    art = zk.compile(main, sources={"helper.zok": helper})
    res = zk.compute_witness(art, ["5"])
    assert res.output == "25"
