"""SMT-LIB2 export of constraint semantics (reference ir/smtlib2.rs).

Produces a formula over bitvector-free integer arithmetic modulo p: each
R1CS constraint becomes (= (mod (* <A,x> <B,x>) p) (mod <C,x> p)), suitable
for formal analysis of compiled programs.
"""

from __future__ import annotations

from .program import Constraint, Directive, LinComb, Prog, var_name


def _lin(lin: LinComb) -> str:
    if not lin.terms:
        return "0"
    parts = []
    for v, c in lin.terms:
        sym = "1" if v == 0 else f"|{var_name(v)}|"
        parts.append(f"(* {c} {sym})" if c != 1 else sym)
    if len(parts) == 1:
        return parts[0]
    return "(+ " + " ".join(parts) + ")"


def to_smtlib2(prog: Prog) -> str:
    p = prog.field.P
    lines = ["(set-logic QF_NIA)", f"(define-fun p () Int {p})"]
    seen = set()

    def declare(lin: LinComb):
        for v, _ in lin.terms:
            if v != 0 and v not in seen:
                seen.add(v)
                lines.append(f"(declare-fun |{var_name(v)}| () Int)")

    body = []
    for s in prog.statements:
        if isinstance(s, Constraint):
            declare(s.quad.left)
            declare(s.quad.right)
            declare(s.lin)
            body.append(
                f"(assert (= (mod (* {_lin(s.quad.left)} {_lin(s.quad.right)}) p) (mod {_lin(s.lin)} p)))"
            )
    lines += body
    lines.append("(check-sat)")
    return "\n".join(lines) + "\n"
