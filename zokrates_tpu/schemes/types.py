"""Proof-system shared types and JSON wire formats.

Byte-exact with the reference so artifacts interoperate:
  * G1 = ["0x<x be hex>", "0x<y be hex>"], hex padded to the field's
    64-bit-limb byte width (zokrates_ark/src/lib.rs:144-271 parse module)
  * G2 over Fq2 = [[x0, x1], [y0, y1]]; over Fq (bw6_761) = [x, y]
  * Fr = "0x<be hex>"
  * TaggedProof / TaggedVerificationKey carry {scheme, curve} tags
    (zokrates_proof_systems/src/tagged.rs:7-56)
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from ..ec.curve import PointG1, PointG2, g1_group, g2_group
from ..ec.tower import Fq2
from ..fields import params as P
from ..fields.field import FIELDS


def _fq_width(curve: str) -> int:
    q = P.BASE_FIELDS[curve].p
    return ((q.bit_length() + 63) // 64) * 8


def _fr_width(curve: str) -> int:
    r = P.SCALAR_FIELDS[curve].p
    return ((r.bit_length() + 63) // 64) * 8


def _hex(v: int, width: int) -> str:
    return "0x" + v.to_bytes(width, "big").hex()


def g1_to_json(pt: PointG1, curve: str) -> List[str]:
    assert not pt.infinity, "cannot serialize the point at infinity"
    w = _fq_width(curve)
    return [_hex(pt.x, w), _hex(pt.y, w)]


def g1_from_json(data, curve: str) -> PointG1:
    grp = g1_group(curve)
    pt = PointG1(grp, int(data[0], 16), int(data[1], 16))
    if not pt.is_on_curve():
        raise ValueError(f"G1 point not on curve {curve}: {data}")
    return pt


def g2_to_json(pt, curve: str):
    w = _fq_width(curve)
    if curve == "bw6_761":  # G2 over Fq
        return [_hex(pt.x, w), _hex(pt.y, w)]
    return [
        [_hex(pt.x.c0, w), _hex(pt.x.c1, w)],
        [_hex(pt.y.c0, w), _hex(pt.y.c1, w)],
    ]


def g2_from_json(data, curve: str):
    grp = g2_group(curve)
    if curve == "bw6_761":
        from ..ec.curve import PointG1 as _P

        pt = _P(grp, int(data[0], 16), int(data[1], 16))
    else:
        x = Fq2(grp.tower, int(data[0][0], 16), int(data[0][1], 16))
        y = Fq2(grp.tower, int(data[1][0], 16), int(data[1][1], 16))
        pt = PointG2(grp, x, y)
    if not pt.is_on_curve():
        raise ValueError(f"G2 point not on curve {curve}: {data}")
    return pt


def fr_to_json(v: int, curve: str) -> str:
    return _hex(v % P.SCALAR_FIELDS[curve].p, _fr_width(curve))


def fr_from_json(s: str, curve: str) -> int:
    return int(s, 16) % P.SCALAR_FIELDS[curve].p


class Proof:
    """Scheme-agnostic proof wrapper: points dict + public inputs."""

    def __init__(self, scheme: str, curve: str, points: Dict[str, Any], inputs: List[str]):
        self.scheme = scheme
        self.curve = curve
        self.points = points
        self.inputs = inputs

    def to_json(self) -> dict:
        return {
            "scheme": self.scheme,
            "curve": self.curve,
            "proof": self.points,
            "inputs": self.inputs,
        }

    @staticmethod
    def from_json(d: dict) -> "Proof":
        return Proof(d["scheme"], d["curve"], d["proof"], d["inputs"])


class VerificationKey:
    def __init__(self, scheme: str, curve: str, data: Dict[str, Any]):
        self.scheme = scheme
        self.curve = curve
        self.data = data

    def to_json(self) -> dict:
        return {"scheme": self.scheme, "curve": self.curve, **self.data}

    @staticmethod
    def from_json(d: dict) -> "VerificationKey":
        d = dict(d)
        scheme = d.pop("scheme")
        curve = d.pop("curve")
        return VerificationKey(scheme, curve, d)
