"""R1CS intermediate representation.

Mirrors the reference IR (zokrates_ast/src/ir/mod.rs): a program is a list of
statements over variables, where a constraint means <quad.l, x> * <quad.r, x>
== <lin, x>. Variable numbering follows common/flat/variable.rs:6-35:

    id == 0  -> ~one (constant 1 wire)
    id  > 0  -> intermediate/input wires (_0 is id 1)
    id  < 0  -> public outputs (~out_0 is id -1)

Coefficients are canonical Python ints modulo the program's field; the field
is carried on the Prog (curve name), matching the reference's curve-tagged
serialization (ir/serialize.rs).

For the prover, a Prog lowers to dense CSR-like device arrays via
ir/matrices.py (the reference instead streams constraints into arkworks'
ConstraintSynthesizer — zokrates_ark/src/lib.rs:80-130).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional, Sequence, Tuple, Union

# -- variables --------------------------------------------------------------

ONE = 0


def var_new(i: int) -> int:
    """i-th intermediate variable (0-based) -> variable id."""
    return 1 + i


def var_public(i: int) -> int:
    """i-th public output -> variable id."""
    return -i - 1


def var_name(v: int) -> str:
    if v == 0:
        return "~one"
    if v > 0:
        return f"_{v - 1}"
    return f"~out_{-v - 1}"


# -- expressions ------------------------------------------------------------


class LinComb:
    """Linear combination: ordered list of (variable, coefficient)."""

    __slots__ = ("terms",)

    def __init__(self, terms: Optional[Sequence[Tuple[int, int]]] = None):
        self.terms: List[Tuple[int, int]] = list(terms) if terms else []

    @staticmethod
    def summand(coeff: int, var: int) -> "LinComb":
        return LinComb([(var, coeff)])

    @staticmethod
    def one() -> "LinComb":
        return LinComb([(ONE, 1)])

    @staticmethod
    def constant(c: int) -> "LinComb":
        return LinComb([(ONE, c)]) if c else LinComb()

    @staticmethod
    def from_var(v: int) -> "LinComb":
        return LinComb([(v, 1)])

    def __add__(self, other: "LinComb") -> "LinComb":
        return LinComb(self.terms + other.terms)

    def __sub__(self, other: "LinComb") -> "LinComb":
        return LinComb(self.terms + [(v, -c) for (v, c) in other.terms])

    def scale(self, k: int) -> "LinComb":
        return LinComb([(v, c * k) for (v, c) in self.terms])

    def __neg__(self) -> "LinComb":
        return self.scale(-1)

    def is_zero(self) -> bool:
        return not self.terms

    def reduce(self, p: int) -> "LinComb":
        """Combine duplicate variables, drop zero coefficients (mod p)."""
        acc: Dict[int, int] = {}
        for v, c in self.terms:
            acc[v] = (acc.get(v, 0) + c) % p
        return LinComb([(v, c) for v, c in acc.items() if c != 0])

    def try_constant(self, p: int) -> Optional[int]:
        """If the lincomb is a constant (only ~one terms), return it."""
        red = self.reduce(p)
        if not red.terms:
            return 0
        if len(red.terms) == 1 and red.terms[0][0] == ONE:
            return red.terms[0][1]
        return None

    def try_summand(self) -> Optional[Tuple[int, int]]:
        """If all terms share one variable, return (var, total_coeff)."""
        if not self.terms:
            return None
        v0 = self.terms[0][0]
        if all(v == v0 for v, _ in self.terms):
            return (v0, sum(c for _, c in self.terms))
        return None

    def is_assignee(self, witness: Dict[int, int]) -> bool:
        """Reference ir/expression.rs:218-222: single summand with coeff 1,
        variable not yet known."""
        return (
            len(self.terms) == 1
            and self.terms[0][1] == 1
            and self.terms[0][0] not in witness
        )

    def variables(self):
        return [v for v, _ in self.terms]

    def __eq__(self, o):
        return isinstance(o, LinComb) and self.terms == o.terms

    def __hash__(self):
        return hash(tuple(self.terms))

    def __repr__(self):
        if not self.terms:
            return "0"
        return " + ".join(
            (f"{c} * {var_name(v)}" if c != 1 else var_name(v)) for v, c in self.terms
        )


class QuadComb:
    """Product of two linear combinations."""

    __slots__ = ("left", "right")

    def __init__(self, left: LinComb, right: LinComb):
        self.left = left
        self.right = right

    @staticmethod
    def from_lin(lin: LinComb) -> "QuadComb":
        return QuadComb(LinComb.one(), lin)

    def try_linear(self) -> Optional[LinComb]:
        """If either side is constant 1, this is linear."""
        for a, b in ((self.left, self.right), (self.right, self.left)):
            if len(a.terms) == 1 and a.terms[0] == (ONE, 1):
                return b
        if self.left.is_zero() or self.right.is_zero():
            return LinComb()
        return None

    def __eq__(self, o):
        return isinstance(o, QuadComb) and self.left == o.left and self.right == o.right

    def __repr__(self):
        return f"({self.left}) * ({self.right})"


# -- solvers ----------------------------------------------------------------


@dataclass(frozen=True)
class Solver:
    """Witness-generation hint (reference common/solvers.rs:12-28).

    name in {ConditionEq, Bits, Div, Xor, Or, ShaAndXorAndXorAnd, ShaCh,
    EuclideanDiv, Zir, Ref, Sha256Round, SnarkVerifyBls12377}; arg carries
    bitwidth / ref index / zir function payload.
    """

    name: str
    arg: object = None

    def signature(self, solvers: Sequence["Solver"] = ()) -> Tuple[int, int]:
        s = self
        if s.name == "Ref":
            s = solvers[s.arg]
        return {
            "ConditionEq": (1, 2),
            "Bits": (1, s.arg or 0),
            "Div": (2, 1),
            "Xor": (2, 1),
            "Or": (2, 1),
            "ShaAndXorAndXorAnd": (3, 1),
            "ShaCh": (3, 1),
            "EuclideanDiv": (2, 2),
            "Sha256Round": (768, 26935),
            "SnarkVerifyBls12377": (s.arg if s.name == "SnarkVerifyBls12377" else 0, 0),
            "Zir": (len(s.arg.params), 1) if s.name == "Zir" else (0, 0),
        }[s.name]


# -- statements -------------------------------------------------------------


# A source span is (module_index, line, col); module_index resolves against
# Prog.module_map. Spans are ignored by equality (reference ir/mod.rs:37-38
# derives Eq/Hash skipping the span) so the optimizer's dedup still fires.


@dataclass
class Constraint:
    quad: QuadComb
    lin: LinComb
    error: Optional[str] = None  # RuntimeError description
    span: Optional[Tuple[int, int, int]] = dfield(default=None, compare=False)


@dataclass
class Directive:
    inputs: List[QuadComb]
    outputs: List[int]
    solver: Solver
    span: Optional[Tuple[int, int, int]] = dfield(default=None, compare=False)


@dataclass
class LogStatement:
    format_string: str            # with '{}' placeholders
    expressions: List[Tuple[object, List[LinComb]]]  # (abi type, lincombs)
    span: Optional[Tuple[int, int, int]] = dfield(default=None, compare=False)


Statement = Union[Constraint, Directive, LogStatement]


@dataclass
class Parameter:
    id: int
    private: bool = True


@dataclass
class Prog:
    """An R1CS program (reference ir/mod.rs:212-221)."""

    curve: str
    arguments: List[Parameter]
    return_count: int
    statements: List[Statement]
    solvers: List[Solver] = dfield(default_factory=list)
    module_map: object = None

    @property
    def field(self):
        from ..fields.field import FIELDS

        return FIELDS[self.curve]

    def constraint_count(self) -> int:
        return sum(1 for s in self.statements if isinstance(s, Constraint))

    def public_count(self) -> int:
        return (
            sum(1 for a in self.arguments if not a.private) + self.return_count
        )

    def public_inputs_variables(self) -> List[int]:
        """Ordered public variables: non-private args, then outputs
        (reference ir/mod.rs public_inputs)."""
        out = [a.id for a in self.arguments if not a.private]
        out += [var_public(i) for i in range(self.return_count)]
        return out

    def returns(self) -> List[int]:
        return [var_public(i) for i in range(self.return_count)]
