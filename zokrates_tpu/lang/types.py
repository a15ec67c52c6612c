"""Concrete (monomorphized) types for the evaluator.

The reference keeps a generic typed AST (zokrates_ast::typed) and
concretizes late; we type-check at instantiation time, so types here are
always fully concrete (array sizes are ints)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple


class CType:
    def size(self) -> int:
        """Number of field elements in the flattened encoding."""
        raise NotImplementedError

    def abi(self) -> dict:
        raise NotImplementedError


@dataclass(frozen=True)
class FieldT(CType):
    def size(self):
        return 1

    def abi(self):
        return {"type": "field"}

    def __str__(self):
        return "field"


@dataclass(frozen=True)
class BoolT(CType):
    def size(self):
        return 1

    def abi(self):
        return {"type": "bool"}

    def __str__(self):
        return "bool"


@dataclass(frozen=True)
class UintT(CType):
    width: int

    def size(self):
        return 1

    def abi(self):
        return {"type": f"u{self.width}"}

    def __str__(self):
        return f"u{self.width}"


@dataclass(frozen=True)
class ArrayT(CType):
    element: CType
    length: int

    def size(self):
        return self.element.size() * self.length

    def abi(self):
        return {
            "type": "array",
            "components": {"size": self.length, "type": self.element.abi()},
        }

    def __str__(self):
        return f"{self.element}[{self.length}]"


@dataclass(frozen=True)
class TupleT(CType):
    elements: Tuple[CType, ...]

    def size(self):
        return sum(e.size() for e in self.elements)

    def abi(self):
        return {
            "type": "tuple",
            "components": {"elements": [e.abi() for e in self.elements]},
        }

    def __str__(self):
        return "(" + ", ".join(str(e) for e in self.elements) + ")"


@dataclass(frozen=True)
class StructT(CType):
    name: str
    members: Tuple[Tuple[str, CType], ...]
    generics: Tuple[int, ...] = ()

    def size(self):
        return sum(t.size() for _, t in self.members)

    def abi(self):
        return {
            "type": "struct",
            "components": {
                "name": self.name,
                "members": [{"name": n, "type": t.abi()} for n, t in self.members],
            },
        }

    def member(self, name: str) -> CType:
        for n, t in self.members:
            if n == name:
                return t
        raise KeyError(name)

    def __str__(self):
        return self.name


FIELD = FieldT()
BOOL = BoolT()
U8, U16, U32, U64 = UintT(8), UintT(16), UintT(32), UintT(64)
