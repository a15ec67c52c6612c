"""Marlin universal-setup scheme (KZG polynomial commitments + AHP).

Status: planned; the reference backend is zokrates_ark/src/marlin.rs with
its Keccak-based Fiat-Shamir rng (marlin.rs:37-107) which must be matched
bit-for-bit for Solidity verifier compatibility.
"""


def universal_setup(curve, size):
    raise NotImplementedError("marlin universal setup is not yet implemented")


def setup_with_srs(srs, r1cs):
    raise NotImplementedError("marlin setup is not yet implemented")


def prove(r1cs, pk, witness, rng=None):
    raise NotImplementedError("marlin prove is not yet implemented")


def verify(vk, proof):
    raise NotImplementedError("marlin verify is not yet implemented")
