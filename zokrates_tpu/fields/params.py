"""Curve and field parameters for every curve the framework supports.

Mirrors the curve set of the reference (zokrates_field/src/{bn128,bls12_381,
bls12_377,bw6_761,pallas,vesta,dummy_curve}.rs): the ZoKrates "field" of a
curve is the curve's *scalar* field Fr (circuits are arithmetized over Fr),
while the prover's group arithmetic runs over the *base* field Fq (and Fq2
for G2 where applicable).

All constants here are standard published parameters; the test-suite
re-derives every derived quantity (two-adicity, Montgomery constants,
generator order / on-curve membership) so a wrong constant fails loudly.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional, Tuple


@dataclass(frozen=True)
class FieldParams:
    """A prime field Z/pZ with precomputed helper constants."""

    name: str
    p: int

    @property
    def bits(self) -> int:
        return self.p.bit_length()

    @property
    def nbytes(self) -> int:
        """Serialized width: LE bytes padded to 64-bit limbs (arkworks BigInt
        convention, reference zokrates_field/src/lib.rs to_bytes_le)."""
        nlimbs64 = (self.bits + 63) // 64
        return nlimbs64 * 8

    @property
    def two_adicity(self) -> int:
        n, s = self.p - 1, 0
        while n % 2 == 0:
            n //= 2
            s += 1
        return s

    @property
    def two_adic_root(self) -> int:
        """Generator of the 2-Sylow subgroup: g^((p-1)/2^s) for a non-residue g."""
        g = self.smallest_nonresidue
        return pow(g, (self.p - 1) >> self.two_adicity, self.p)

    @property
    def smallest_nonresidue(self) -> int:
        g = 2
        while pow(g, (self.p - 1) // 2, self.p) != self.p - 1:
            g += 1
        return g


# ---------------------------------------------------------------------------
# BN254 (alt_bn128) — reference zokrates_field/src/bn128.rs
# ---------------------------------------------------------------------------

BN254_Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN254_X = 4965661367192848881  # BN parameter t; 6t+2 drives the ate loop

# ---------------------------------------------------------------------------
# BLS12-381 — reference zokrates_field/src/bls12_381.rs
# ---------------------------------------------------------------------------

BLS12_381_Q = int(
    "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab",
    16,
)
BLS12_381_R = int("73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001", 16)
BLS12_381_X = -0xD201000000010000

# ---------------------------------------------------------------------------
# BLS12-377 — reference zokrates_field/src/bls12_377.rs
# ---------------------------------------------------------------------------

BLS12_377_Q = int(
    "1ae3a4617c510eac63b05c06ca1493b1a22d9f300f5138f1ef3622fba0948001"
    "70b5d44300000008508c00000000001",
    16,
)
BLS12_377_R = int("12ab655e9a2ca55660b44d1e5c37b00159aa76fed00000010a11800000000001", 16)
BLS12_377_X = 0x8508C00000000001

# ---------------------------------------------------------------------------
# BW6-761 — reference zokrates_field/src/bw6_761.rs
# Fr(BW6-761) == Fq(BLS12-377), which is what enables in-circuit verification
# of BLS12-377 proofs (reference zokrates_embed/src/ark.rs).
# ---------------------------------------------------------------------------

BW6_761_Q = int(
    "689145038431573253939678968227565754247966891253615010951379016020962342224349"
    "173608768318328941168764086456775378661345116175912055424775934951169912530159"
    "8951605099378508850372543631423596795951899700429969112842764913119068299"
)
BW6_761_R = BLS12_377_Q

# ---------------------------------------------------------------------------
# Pasta curves (Nova IVC cycle) — reference zokrates_field/src/{pallas,vesta}.rs
# Pallas: y^2 = x^3 + 5 over Fp, scalar field Fq; Vesta is the mirror.
# ---------------------------------------------------------------------------

PASTA_FP = int("40000000000000000000000000000000224698fc094cf91b992d30ed00000001", 16)
PASTA_FQ = int("40000000000000000000000000000000224698fc0994a8dd8c46eb2100000001", 16)

# ---------------------------------------------------------------------------
# Scalar-field registry: curve name -> Fr params (the "ZoKrates field")
# ---------------------------------------------------------------------------

SCALAR_FIELDS = {
    "bn128": FieldParams("bn128", BN254_R),
    "bls12_381": FieldParams("bls12_381", BLS12_381_R),
    "bls12_377": FieldParams("bls12_377", BLS12_377_R),
    "bw6_761": FieldParams("bw6_761", BW6_761_R),
    "pallas": FieldParams("pallas", PASTA_FQ),
    "vesta": FieldParams("vesta", PASTA_FP),
    "curve25519": FieldParams(
        # kept for parity with helpers::CurveParameter spelling in some forks;
        # not exposed by the CLI
        "curve25519",
        2**252 + 27742317777372353535851937790883648493,
    ),
}

BASE_FIELDS = {
    "bn128": FieldParams("bn128_fq", BN254_Q),
    "bls12_381": FieldParams("bls12_381_fq", BLS12_381_Q),
    "bls12_377": FieldParams("bls12_377_fq", BLS12_377_Q),
    "bw6_761": FieldParams("bw6_761_fq", BW6_761_Q),
    "pallas": FieldParams("pallas_fq", PASTA_FP),
    "vesta": FieldParams("vesta_fq", PASTA_FQ),
}


def curve_id(p: int, nbytes: Optional[int] = None) -> bytes:
    """4-byte curve id: SHA256 of the modulus as little-endian bytes padded to
    the arkworks BigInt width (reference zokrates_field/src/lib.rs `fn id`)."""
    if nbytes is None:
        nlimbs64 = (p.bit_length() + 63) // 64
        nbytes = nlimbs64 * 8
    return hashlib.sha256(p.to_bytes(nbytes, "little")).digest()[:4]
