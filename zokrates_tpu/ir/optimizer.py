"""IR-level optimizer chain (reference zokrates_core/src/optimizer/mod.rs:22-63).

Streaming folds in the reference's order:

  1. Redefinition (redefinition.rs): a constraint of the form
     (1) * L == y with y a fresh non-output variable defines y; substitute
     y := L downstream and drop the constraint.
  2. Tautology (tautology.rs): drop constraints whose two sides are
     syntactically equal after substitution.
  3. Canonicalizer: normalize lincombs (merge duplicate terms, drop zeros).
  4. Directive (directive.rs): drop directives whose outputs are never used.
  5. Duplicate (duplicate.rs): hash-set dedup of identical constraints.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

from .program import Constraint, Directive, LinComb, LogStatement, Prog, QuadComb


def _subst_lin(lin: LinComb, subs: Dict[int, LinComb], p: int) -> LinComb:
    if not any(v in subs for v, _ in lin.terms):
        return lin.reduce(p)
    out = LinComb()
    for v, c in lin.terms:
        if v in subs:
            out = out + subs[v].scale(c)
        else:
            out = out + LinComb([(v, c)])
    return out.reduce(p)


def _subst_quad(q: QuadComb, subs, p) -> QuadComb:
    return QuadComb(_subst_lin(q.left, subs, p), _subst_lin(q.right, subs, p))


def optimize(prog: Prog) -> Prog:
    p = prog.field.P
    subs: Dict[int, LinComb] = {}
    arg_vars = {a.id for a in prog.arguments}
    # variables consumed (read) so far — a variable that has only ever been
    # *written* (as a directive output) may still be substituted away
    used_so_far: Set[int] = set()

    def mark_used(lin: LinComb):
        for v, _ in lin.terms:
            used_so_far.add(v)

    # directive outputs must not be substituted away: the directive keeps
    # writing them, and dropping their defining constraint would leave them
    # unconstrained (reference redefinition.rs:181 "ignored set").
    # EXCEPTION: Zir solvers come from asm blocks, which the reference
    # folds in `aggressive` mode (redefinition.rs fold_statement_cases on
    # Block: outputs stay substitutable; orphaned directives are swept by
    # the usage cleanup below) — corpus core/assembly/propagation/*.
    dir_outputs: Set[int] = set()

    def substitutable(y: int) -> bool:
        return (
            y > 0
            and y not in arg_vars
            and y not in used_so_far
            and y not in subs
            and y not in dir_outputs
        )

    out1: List = []
    for s in prog.statements:
        if isinstance(s, Constraint):
            quad = _subst_quad(s.quad, subs, p)
            lin = _subst_lin(s.lin, subs, p)
            left_lin = quad.try_linear()
            if left_lin is not None:
                # redefinition: (1)*(L) == y  or  (1)*(y) == L
                summand = lin.try_summand()
                if (
                    summand is not None
                    and summand[1] % p == 1
                    and substitutable(summand[0])
                    and all(v >= 0 and v != summand[0] for v, _ in left_lin.terms)
                ):
                    subs[summand[0]] = left_lin
                    continue
                s2 = left_lin.try_summand()
                if (
                    s2 is not None
                    and s2[1] % p == 1
                    and substitutable(s2[0])
                    and all(v >= 0 and v != s2[0] for v, _ in lin.terms)
                ):
                    subs[s2[0]] = lin
                    continue
                # tautology
                if left_lin.reduce(p).terms == lin.reduce(p).terms:
                    continue
            mark_used(quad.left)
            mark_used(quad.right)
            mark_used(lin)
            out1.append(Constraint(quad, lin, s.error, span=s.span))
        elif isinstance(s, Directive):
            inputs = [_subst_quad(q, subs, p) for q in s.inputs]
            for q in inputs:
                mark_used(q.left)
                mark_used(q.right)
            if s.solver.name != "Zir":
                dir_outputs.update(s.outputs)
            out1.append(Directive(inputs, s.outputs, s.solver, span=s.span))
        elif isinstance(s, LogStatement):
            exprs = [
                (ty, [_subst_lin(l, subs, p) for l in lins]) for ty, lins in s.expressions
            ]
            for _, lins in exprs:
                for l in lins:
                    mark_used(l)
            out1.append(LogStatement(s.format_string, exprs, span=s.span))
        else:
            out1.append(s)

    # usage analysis for directive cleanup
    used: Set[int] = set()
    for s in out1:
        if isinstance(s, Constraint):
            for v, _ in s.quad.left.terms + s.quad.right.terms + s.lin.terms:
                used.add(v)
        elif isinstance(s, Directive):
            for q in s.inputs:
                for v, _ in q.left.terms + q.right.terms:
                    used.add(v)
        elif isinstance(s, LogStatement):
            for _, lins in s.expressions:
                for l in lins:
                    for v, _ in l.terms:
                        used.add(v)

    out2: List = []
    seen_constraints = set()
    for s in out1:
        if isinstance(s, Directive):
            if not any(o in used for o in s.outputs):
                continue
            out2.append(s)
        elif isinstance(s, Constraint):
            key = (
                tuple(sorted(s.quad.left.terms)),
                tuple(sorted(s.quad.right.terms)),
                tuple(sorted(s.lin.terms)),
            )
            # product is commutative in the quad
            key_sym = (key[1], key[0], key[2])
            if key in seen_constraints or key_sym in seen_constraints:
                continue
            seen_constraints.add(key)
            out2.append(s)
        else:
            out2.append(s)

    return Prog(
        curve=prog.curve,
        arguments=prog.arguments,
        return_count=prog.return_count,
        statements=out2,
        solvers=prog.solvers,
        module_map=prog.module_map,
    )
