"""Scalar prime-field elements backed by Python integers.

This is the *host-side* field layer: the compiler, interpreter, serializers
and small verifier-side computations use it. Bulk prover math (MSM, NTT,
witness vectors) lives in device limb form (`zokrates_tpu.fields.jfield`).

API mirrors the reference `Field` trait (zokrates_field/src/lib.rs:77-156):
to_byte_vector / from_byte_vector (LE, padded to 64-bit limb width),
inverse_mul, max_unique_value = 2^(bits-1)-1, to_compact_dec_string,
id() = SHA256(modulus LE bytes)[0:4], bits(), to_bits_be.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Type, Union

from .params import SCALAR_FIELDS, FieldParams, curve_id


class FieldElement:
    """An element of Z/pZ. Subclasses fix the modulus via class attributes."""

    __slots__ = ("v",)

    # set by make_field
    P: int = 0
    NAME: str = ""
    BITS: int = 0
    NBYTES: int = 0

    def __init__(self, v: Union[int, "FieldElement", str, bool] = 0):
        if isinstance(v, FieldElement):
            v = v.v
        elif isinstance(v, str):
            v = int(v, 0)
        elif isinstance(v, bool):
            v = int(v)
        self.v = v % self.P

    # -- constructors -------------------------------------------------------
    @classmethod
    def zero(cls) -> "FieldElement":
        return cls(0)

    @classmethod
    def one(cls) -> "FieldElement":
        return cls(1)

    @classmethod
    def min_value(cls) -> "FieldElement":
        return cls(0)

    @classmethod
    def max_value(cls) -> "FieldElement":
        return cls(cls.P - 1)

    @classmethod
    def max_unique_value(cls) -> "FieldElement":
        # reference lib.rs: 2^(required_bits - 1) - 1
        return cls((1 << (cls.BITS - 1)) - 1)

    @classmethod
    def get_required_bits(cls) -> int:
        return cls.BITS

    @classmethod
    def try_from_dec_str(cls, s: str) -> "FieldElement":
        return cls(int(s, 10))

    @classmethod
    def from_byte_vector(cls, b: bytes) -> "FieldElement":
        return cls(int.from_bytes(b, "little"))

    @classmethod
    def id(cls) -> bytes:
        return curve_id(cls.P, cls.NBYTES)

    @classmethod
    def name(cls) -> str:
        return cls.NAME

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        return type(self)(self.v + _val(o))

    __radd__ = __add__

    def __sub__(self, o):
        return type(self)(self.v - _val(o))

    def __rsub__(self, o):
        return type(self)(_val(o) - self.v)

    def __mul__(self, o):
        return type(self)(self.v * _val(o))

    __rmul__ = __mul__

    def __neg__(self):
        return type(self)(-self.v)

    def __pow__(self, e: int):
        return type(self)(pow(self.v, int(e), self.P))

    def __truediv__(self, o):
        return self * type(self)(_val(o)).inverse_mul()

    def inverse_mul(self) -> "FieldElement":
        if self.v == 0:
            raise ZeroDivisionError("inverse of zero field element")
        return type(self)(pow(self.v, -1, self.P))

    def checked_div(self, o) -> Optional["FieldElement"]:
        ov = _val(o) % self.P
        if ov == 0:
            return None
        return self * type(self)(ov).inverse_mul()

    # -- predicates / conversions ------------------------------------------
    def is_zero(self) -> bool:
        return self.v == 0

    def is_one(self) -> bool:
        return self.v == 1

    def __eq__(self, o):
        return isinstance(o, FieldElement) and o.P == self.P and o.v == self.v

    def __hash__(self):
        return hash((self.P, self.v))

    def __lt__(self, o):
        return self.v < _val(o)

    def __le__(self, o):
        return self.v <= _val(o)

    def __int__(self):
        return self.v

    def __bool__(self):
        return self.v != 0

    def bits(self) -> int:
        return max(self.v.bit_length(), 1)

    def to_bits_be(self, width: Optional[int] = None) -> List[bool]:
        width = self.BITS if width is None else width
        return [bool((self.v >> (width - 1 - i)) & 1) for i in range(width)]

    def to_byte_vector(self) -> bytes:
        return self.v.to_bytes(self.NBYTES, "little")

    def to_dec_string(self) -> str:
        return str(self.v)

    def to_compact_dec_string(self) -> str:
        # reference: values <= (p-1)/2 print positive, else as (-(p-v))
        if self.v <= (self.P - 1) // 2:
            return str(self.v)
        return "(-{})".format(self.P - self.v)

    def __repr__(self):
        return f"{self.NAME}({self.v})"

    def __str__(self):
        return str(self.v)


def _val(o) -> int:
    return o.v if isinstance(o, FieldElement) else int(o)


@lru_cache(maxsize=None)
def make_field(curve: str) -> Type[FieldElement]:
    """Field class for a curve name ('bn128', 'bls12_381', ...)."""
    fp = SCALAR_FIELDS[curve]
    return _make_field_from_params(fp)


@lru_cache(maxsize=None)
def make_field_p(p: int, name: str = "custom") -> Type[FieldElement]:
    """Field class for an arbitrary prime modulus (base fields, tests)."""
    return _make_field_from_params(FieldParams(name, p))


def _make_field_from_params(fp: FieldParams) -> Type[FieldElement]:
    cls = type(
        f"F_{fp.name}",
        (FieldElement,),
        {
            "__slots__": (),
            "P": fp.p,
            "NAME": fp.name,
            "BITS": fp.bits,
            "NBYTES": fp.nbytes,
            "PARAMS": fp,
        },
    )
    return cls


# Convenience concrete classes
Bn128Field = make_field("bn128")
Bls12_381Field = make_field("bls12_381")
Bls12_377Field = make_field("bls12_377")
Bw6_761Field = make_field("bw6_761")
PallasField = make_field("pallas")
VestaField = make_field("vesta")
# tiny field for flattener unit tests (reference dummy_curve.rs: F_7)
DummyField = make_field_p(7, "dummy")

FIELDS = {
    "bn128": Bn128Field,
    "bls12_381": Bls12_381Field,
    "bls12_377": Bls12_377Field,
    "bw6_761": Bw6_761Field,
    "pallas": PallasField,
    "vesta": VestaField,
}
