"""Dense-indexed R1CS extraction from an IR Prog.

Replicates the variable layout the reference's ark adapter induces
(zokrates_ark/src/lib.rs:80-130): instance variables are [~one, non-private
arguments in declaration order, outputs in first-encounter order]; witness
variables are [private arguments in declaration order, internal wires in
first-encounter order]. Dense index = instance block then witness block,
which is exactly what the QAP/Groth16 math wants.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from .program import Constraint, LinComb, Prog
from .witness import Witness

SparseRow = List[Tuple[int, int]]  # (dense variable index, coefficient)


@dataclass
class R1CS:
    curve: str
    num_instance: int  # includes the leading constant-one variable
    num_witness: int
    A: List[SparseRow]
    B: List[SparseRow]
    C: List[SparseRow]
    ir_to_dense: Dict[int, int]

    @property
    def num_variables(self) -> int:
        return self.num_instance + self.num_witness

    @property
    def num_constraints(self) -> int:
        return len(self.A)

    def full_assignment(self, witness: Witness) -> List[int]:
        """Witness (IR-variable keyed) -> dense assignment vector."""
        z = [0] * self.num_variables
        z[0] = 1
        for ir_var, dense in self.ir_to_dense.items():
            z[dense] = witness[ir_var]
        return z

    def check(self, z: Sequence[int], p: int) -> bool:
        def ev(row, z):
            return sum(c * z[i] for i, c in row) % p

        return all(
            ev(a, z) * ev(b, z) % p == ev(c, z)
            for a, b, c in zip(self.A, self.B, self.C)
        )


def r1cs_from_prog(prog: Prog) -> R1CS:
    p = prog.field.P

    ir_to_dense: Dict[int, int] = {}
    instance_order: List[int] = []
    witness_order: List[int] = []

    # pass 1: discover variables in the reference's allocation order
    for arg in prog.arguments:
        (witness_order if arg.private else instance_order).append(arg.id)

    seen = {0} | set(a.id for a in prog.arguments)

    constraints = [s for s in prog.statements if isinstance(s, Constraint)]

    def visit(lin: LinComb):
        for v, _ in lin.terms:
            if v not in seen:
                seen.add(v)
                (instance_order if v < 0 else witness_order).append(v)

    for s in constraints:
        visit(s.quad.left)
        visit(s.quad.right)
        visit(s.lin)

    num_instance = 1 + len(instance_order)
    for i, v in enumerate(instance_order):
        ir_to_dense[v] = 1 + i
    for i, v in enumerate(witness_order):
        ir_to_dense[v] = num_instance + i

    def row(lin: LinComb) -> SparseRow:
        acc: Dict[int, int] = {}
        for v, c in lin.terms:
            d = 0 if v == 0 else ir_to_dense[v]
            acc[d] = (acc.get(d, 0) + c) % p
        return [(d, c) for d, c in acc.items() if c]

    A, B, C = [], [], []
    for s in constraints:
        A.append(row(s.quad.left))
        B.append(row(s.quad.right))
        C.append(row(s.lin))

    return R1CS(
        curve=prog.curve,
        num_instance=num_instance,
        num_witness=len(witness_order),
        A=A,
        B=B,
        C=C,
        ir_to_dense=ir_to_dense,
    )
