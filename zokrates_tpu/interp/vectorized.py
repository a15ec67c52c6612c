"""Vectorized (levelized) witness generation on device.

The reference witness VM is a strictly sequential statement walk with
BTreeMap lookups (zokrates_interpreter/src/lib.rs:40-138) — O(n log n)
scalar field ops that dominate wall clock at 2^20 constraints. The TPU
redesign (SURVEY §2.5 row 3):

  * PLAN (host, once per program): topologically levelize the statements.
    A statement's level is 1 + max(level of the variables it reads);
    program inputs and ~one sit at level 0. Within a level, assigning
    constraints become one batched quad-evaluation (two COO sparse
    matvecs + a Montgomery product), and directives are grouped by
    solver kind into batched device kernels (bits / inverse / div /
    sha-logic / euclidean-div as lax loops). Non-assigning constraints
    are deferred to one batched end-of-program check — exactly the
    A·z∘B·z == C·z residual.
  * EXECUTE: the witness lives as a dense (V, nl) uint32 Montgomery limb
    array on device; each level gathers from it and scatters back. The
    whole level walk is traced into a handful of jitted segments
    (split only around host-only solvers: Zir lambdas, snark_verify),
    so steady-state execution is a few device dispatches rather than
    O(statements) Python steps.

Semantics guard: outputs are bit-identical to interp.interpreter; on any
planning obstruction or execution failure the caller falls back to the
scalar interpreter, which reproduces the reference's error behavior
(first failing statement in program order). The adversarial
try_out_of_range mode is scalar-only by design.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ir.program import (
    Constraint,
    Directive,
    LinComb,
    LogStatement,
    Prog,
    QuadComb,
    Solver,
)
from ..ir.witness import Witness
from .interpreter import (
    ExecutionError,
    Interpreter,
    UnsatisfiedConstraint,
    WrongInputCount,
)

# Solvers with device kernels; everything else splits a host segment.
_DEVICE_SOLVERS = {
    "Bits",
    "ConditionEq",
    "Div",
    "Xor",
    "Or",
    "ShaAndXorAndXorAnd",
    "ShaCh",
    "EuclideanDiv",
}

# segment_sum accumulates 16-bit limbs in uint32: cap terms per row.
_MAX_TERMS = 1 << 15


class PlanError(Exception):
    """Program shape not vectorizable (use the scalar interpreter)."""


# ---------------------------------------------------------------------------
# Plan data structures (all-numpy; converted to device arrays lazily)
# ---------------------------------------------------------------------------


@dataclass
class _QuadBatch:
    """k quad-combs evaluated as (L·w) ∘ (R·w) over dense witness indices."""

    k: int
    l_rows: np.ndarray
    l_cols: np.ndarray
    l_coef: np.ndarray  # (nnz,) canonical ints encoded later
    r_rows: np.ndarray
    r_cols: np.ndarray
    r_coef: np.ndarray


@dataclass
class _Group:
    solver: Optional[Solver]  # None = assigning constraints
    arity: int
    n_out: int
    quads: _QuadBatch
    out_idx: np.ndarray  # (k * n_out,) dense indices


@dataclass
class _Level:
    groups: List[_Group]


@dataclass
class _CheckBatch:
    """All non-assigning constraints, checked at once at the end."""

    quads: _QuadBatch
    lin_rows: np.ndarray
    lin_cols: np.ndarray
    lin_coef: np.ndarray
    errors: List[Optional[str]]


@dataclass
class _Plan:
    curve: str
    num_dense: int
    var_of_dense: List[int]
    dense_of_var: Dict[int, int]
    arg_idx: np.ndarray  # dense indices of prog.arguments, in order
    segments: List[List[_Level]]  # device segments
    host_groups: List[Optional[List[Tuple[Directive, List[int]]]]]
    # host_groups[i] runs after segments[i] (None after the last)
    checks: Optional[_CheckBatch]
    logs: List[LogStatement]
    _exec: dict = dfield(default_factory=dict)  # compiled segment cache


def _quad_batch(quads: List[QuadComb], dense: Dict[int, int]) -> _QuadBatch:
    lr, lc, lv = [], [], []
    rr, rc, rv = [], [], []
    for i, q in enumerate(quads):
        if len(q.left.terms) > _MAX_TERMS or len(q.right.terms) > _MAX_TERMS:
            raise PlanError("quad row too wide for lazy u32 accumulation")
        for v, c in q.left.terms:
            lr.append(i)
            lc.append(dense[v])
            lv.append(c)
        for v, c in q.right.terms:
            rr.append(i)
            rc.append(dense[v])
            rv.append(c)
    if not lr:
        lr, lc, lv = [0], [0], [0]
    if not rr:
        rr, rc, rv = [0], [0], [0]
    return _QuadBatch(
        k=len(quads),
        l_rows=np.asarray(lr, np.int32),
        l_cols=np.asarray(lc, np.int32),
        l_coef=np.asarray([v for v in lv], object),
        r_rows=np.asarray(rr, np.int32),
        r_cols=np.asarray(rc, np.int32),
        r_coef=np.asarray([v for v in rv], object),
    )


def build_plan(prog: Prog) -> _Plan:
    """Levelize `prog` (host-side, one pass). Raises PlanError when the
    program cannot be executed out of order (use-before-def, double
    definition, unsupported shapes)."""
    p = prog.field.P

    dense: Dict[int, int] = {0: 0}
    var_of_dense: List[int] = [0]
    level_of: Dict[int, int] = {0: 0}

    def ensure(v: int) -> int:
        if v not in dense:
            dense[v] = len(var_of_dense)
            var_of_dense.append(v)
        return dense[v]

    arg_idx = []
    for a in prog.arguments:
        ensure(a.id)
        level_of[a.id] = 0
        arg_idx.append(dense[a.id])

    # pass 1: statement levels
    defined = set(level_of)
    checks: List[Tuple[Constraint]] = []
    # per level: {"assign": [(quad, out_var)], (solver): [(directive)]}
    levels: List[Dict] = []
    check_list: List[Constraint] = []
    logs: List[LogStatement] = []

    def stmt_level(vars_used) -> int:
        lv = 0
        for v in vars_used:
            if v not in level_of:
                raise PlanError(f"variable {v} used before definition")
            lv = max(lv, level_of[v])
        return lv

    def at_level(lv: int) -> Dict:
        while len(levels) <= lv:
            levels.append({})
        return levels[lv]

    for stmt in prog.statements:
        if isinstance(stmt, Constraint):
            t = stmt.lin.terms
            if len(t) == 1 and t[0][1] == 1 and t[0][0] not in defined:
                out = t[0][0]
                lv = stmt_level(
                    stmt.quad.left.variables() + stmt.quad.right.variables()
                )
                at_level(lv).setdefault("assign", []).append((stmt.quad, out))
                level_of[out] = lv + 1
                defined.add(out)
                ensure(out)
            else:
                stmt_level(
                    stmt.quad.left.variables()
                    + stmt.quad.right.variables()
                    + stmt.lin.variables()
                )  # validates defined-ness
                check_list.append(stmt)
        elif isinstance(stmt, Directive):
            used = []
            for q in stmt.inputs:
                used += q.left.variables() + q.right.variables()
            lv = stmt_level(used)
            solver = stmt.solver
            if solver.name == "Ref":
                solver = prog.solvers[solver.arg]
            key = (solver.name, solver.arg if solver.name == "Bits" else id(solver))
            if solver.name in {"Xor", "Or", "ShaAndXorAndXorAnd", "ShaCh",
                               "ConditionEq", "Div", "EuclideanDiv"}:
                key = (solver.name,)
            at_level(lv).setdefault(key, []).append((stmt, solver))
            for out in stmt.outputs:
                if out in defined:
                    raise PlanError(f"variable {out} defined twice")
                level_of[out] = lv + 1
                defined.add(out)
                ensure(out)
        elif isinstance(stmt, LogStatement):
            logs.append(stmt)
        else:
            raise PlanError(f"unknown statement {stmt!r}")

    # pass 2: build device groups / host groups per level, cut segments.
    # Segments are also capped in length: one giant traced function makes
    # XLA compile time superlinear (sha256's 191 levels took minutes as a
    # single jit); ~24 levels per executable keeps compiles seconds each.
    MAX_SEG_LEVELS = 24
    segments: List[List[_Level]] = [[]]
    host_groups: List[Optional[List[Tuple[Directive, List[int]]]]] = []

    for lvl in levels:
        device_groups: List[_Group] = []
        host: List[Tuple[Directive, List[int]]] = []
        for key, items in lvl.items():
            if key == "assign":
                quads = [q for q, _ in items]
                outs = np.asarray([dense[v] for _, v in items], np.int32)
                device_groups.append(
                    _Group(None, 1, 1, _quad_batch(quads, dense), outs)
                )
                continue
            solver = items[0][1]
            if solver.name in _DEVICE_SOLVERS:
                n_in, n_out = solver.signature(prog.solvers)
                quads = []
                outs = []
                for d, _ in items:
                    if len(d.inputs) != n_in or len(d.outputs) != n_out:
                        raise PlanError("directive arity mismatch")
                    quads += d.inputs
                    outs += [dense[v] for v in d.outputs]
                device_groups.append(
                    _Group(
                        solver,
                        n_in,
                        n_out,
                        _quad_batch(quads, dense),
                        np.asarray(outs, np.int32),
                    )
                )
            else:
                for d, s in items:
                    host.append((d, [dense[v] for v in d.outputs]))
        if device_groups:
            if len(segments[-1]) >= MAX_SEG_LEVELS:
                host_groups.append(None)
                segments.append([])
            segments[-1].append(_Level(device_groups))
        if host:
            host_groups.append(host)
            segments.append([])

    while len(host_groups) < len(segments):
        host_groups.append(None)

    check_batch = None
    if check_list:
        cq = _quad_batch([c.quad for c in check_list], dense)
        lr, lc, lv = [], [], []
        for i, c in enumerate(check_list):
            for v, co in c.lin.terms:
                lr.append(i)
                lc.append(dense[v])
                lv.append(co)
        if not lr:
            lr, lc, lv = [0], [0], [0]
        check_batch = _CheckBatch(
            quads=cq,
            lin_rows=np.asarray(lr, np.int32),
            lin_cols=np.asarray(lc, np.int32),
            lin_coef=np.asarray(lv, object),
            errors=[c.error for c in check_list],
        )

    return _Plan(
        curve=prog.curve,
        num_dense=len(var_of_dense),
        var_of_dense=var_of_dense,
        dense_of_var=dense,
        arg_idx=np.asarray(arg_idx, np.int32),
        segments=segments,
        host_groups=host_groups,
        checks=check_batch,
        logs=logs,
    )


# ---------------------------------------------------------------------------
# Device execution
# ---------------------------------------------------------------------------


def _dev_quads(f, qb: _QuadBatch, p: int):
    """Encode a quad batch's COO arrays on device (Montgomery coeffs)."""
    import jax.numpy as jnp

    from ..fields.limbs import ints_to_limbs

    def enc(coefs):
        arr = ints_to_limbs([int(c) % p for c in coefs], f.nl)
        return f.to_mont(jnp.asarray(arr))

    return dict(
        k=qb.k,
        lr=jnp.asarray(qb.l_rows),
        lc=jnp.asarray(qb.l_cols),
        lv=enc(qb.l_coef),
        rr=jnp.asarray(qb.r_rows),
        rc=jnp.asarray(qb.r_cols),
        rv=enc(qb.r_coef),
    )


def _eval_quads(f, d, W):
    """(k, nl) Montgomery values of the batched quads against witness W."""
    import jax
    import jax.numpy as jnp

    def side(rows, cols, coef):
        vals = f.mul_(coef, jnp.take(W, cols, axis=0))
        sums = jax.ops.segment_sum(
            vals, rows, num_segments=d["k"], indices_are_sorted=True
        )
        return f.reduce_wide_(sums)

    return f.mul_(side(d["lr"], d["lc"], d["lv"]), side(d["rr"], d["rc"], d["rv"]))


def _shl1_with_bit(limbs, bit):
    """(k, nl) little-endian 16-bit limbs << 1 | bit (bit: (k,) in {0,1})."""
    import jax.numpy as jnp

    carry = jnp.concatenate([bit[:, None], limbs[:, :-1] >> 15], axis=1)
    return ((limbs << 1) & np.uint32(0xFFFF)) | carry


def _all_bits_msb_first(v_can, nbits, nl):
    """(k, nl) canonical limbs -> (k, nbits) bits, index 0 = MSB."""
    import jax.numpy as jnp

    pos = np.arange(nbits - 1, -1, -1)
    li = np.minimum(pos // 16, nl - 1).astype(np.int32)
    sh = (pos % 16).astype(np.uint32)
    valid = (pos // 16 < nl).astype(np.uint32)
    return ((v_can[:, li] >> sh[None, :]) & 1) * valid[None, :]


def _solver_kernel(f, solver: Solver, ins, p: int):
    """ins: (k, arity, nl) Montgomery -> (k, n_out, nl) Montgomery."""
    import jax
    import jax.numpy as jnp

    name = solver.name
    k = ins.shape[0]
    one = f.ones_mont((k,))
    zero = f.zeros((k,))

    if name == "Bits":
        w = solver.arg
        v = f.from_mont_(ins[:, 0])
        bits = _all_bits_msb_first(v, w, f.nl)  # (k, w)
        return jnp.where(bits[..., None] == 1, one[:, None, :], zero[:, None, :])
    if name == "ConditionEq":
        x = ins[:, 0]
        z = f.is_zero(x)
        out0 = f.select(z, zero, one)
        out1 = f.select(z, one, f.pow_const_(x, p - 2))
        return jnp.stack([out0, out1], axis=1)
    if name == "Div":
        a, b = ins[:, 0], ins[:, 1]
        z = f.is_zero(b)
        res = f.select(z, one, f.mul_(a, f.pow_const_(b, p - 2)))
        return res[:, None]
    if name == "Xor":
        x, y = ins[:, 0], ins[:, 1]
        xy = f.mul_(x, y)
        return f.sub_(f.add_(x, y), f.add_(xy, xy))[:, None]
    if name == "Or":
        x, y = ins[:, 0], ins[:, 1]
        return f.sub_(f.add_(x, y), f.mul_(x, y))[:, None]
    if name == "ShaAndXorAndXorAnd":
        a, b, c = ins[:, 0], ins[:, 1], ins[:, 2]
        t = f.mul_(b, c)
        return f.sub_(t, f.mul_(f.sub_(f.add_(t, t), f.add_(b, c)), a))[:, None]
    if name == "ShaCh":
        a, b, c = ins[:, 0], ins[:, 1], ins[:, 2]
        return f.add_(f.mul_(a, f.sub_(b, c)), c)[:, None]
    if name == "EuclideanDiv":
        from ..fields.jfield import _borrow_sub

        n_can = f.from_mont_(ins[:, 0])
        d_can = f.from_mont_(ins[:, 1])
        nbits = f.nl * 16
        bits = _all_bits_msb_first(n_can, nbits, f.nl)  # MSB first

        def body(state, bit_col):
            q, rem = state
            rem = _shl1_with_bit(rem, bit_col)
            diff, borrow = _borrow_sub(rem, d_can)
            ge = borrow == 0
            rem = jnp.where(ge[:, None], diff, rem)
            q = _shl1_with_bit(q, ge.astype(jnp.uint32))
            return (q, rem), None

        init = (jnp.zeros_like(n_can), jnp.zeros_like(n_can))
        (q, rem), _ = jax.lax.scan(body, init, jnp.transpose(bits))
        dz = f.is_zero(d_can)
        q = jnp.where(dz[:, None], jnp.zeros_like(q), q)
        rem = jnp.where(dz[:, None], n_can, rem)
        return jnp.stack([f.to_mont_(q), f.to_mont_(rem)], axis=1)
    raise PlanError(f"no device kernel for solver {name}")


class VectorizedInterpreter:
    """Drop-in device interpreter. Falls back to the scalar interpreter on
    planning obstructions or on any execution failure (error-path parity)."""

    def __init__(self):
        self._plans: Dict[int, _Plan] = {}

    def _plan(self, prog: Prog) -> _Plan:
        plan = self._plans.get(id(prog))
        if plan is None:
            plan = build_plan(prog)
            self._plans[id(prog)] = plan
        return plan

    def execute(self, prog: Prog, inputs: Sequence[int], log_stream=None) -> Witness:
        if len(prog.arguments) != len(inputs):
            raise WrongInputCount(len(prog.arguments), len(inputs))
        try:
            plan = self._plan(prog)
        except PlanError:
            return Interpreter().execute(prog, inputs, log_stream)
        try:
            return self._execute_plan(prog, plan, inputs, log_stream)
        except ExecutionError:
            raise
        except Exception:
            # semantics guard: let the scalar walk produce the canonical
            # error (or, for false alarms, the canonical witness)
            return Interpreter().execute(prog, inputs, log_stream)

    # -- compiled segment construction -------------------------------------
    def _compiled(self, plan: _Plan, prog: Prog):
        import jax

        cache = plan._exec
        if cache:
            return cache
        p = prog.field.P
        from ..fields.jfield import field_ops

        f = field_ops(p)

        seg_fns = []
        for seg in plan.segments:
            dev_levels = []
            for lvl in seg:
                dev_groups = []
                for g in lvl.groups:
                    dev_groups.append((g, _dev_quads(f, g.quads, p)))
                dev_levels.append(dev_groups)

            def make(dev_levels):
                def run(W):
                    import jax.numpy as jnp

                    for dev_groups in dev_levels:
                        for g, d in dev_groups:
                            vals = _eval_quads(f, d, W)
                            if g.solver is None:
                                out = vals
                            else:
                                out = _solver_kernel(
                                    f, g.solver, vals.reshape(g.quads.k // g.arity, g.arity, f.nl), p
                                ).reshape(-1, f.nl)
                            W = W.at[jnp.asarray(g.out_idx)].set(out)
                    return W

                return run

            seg_fns.append(jax.jit(make(dev_levels), donate_argnums=0))

        check_fn = None
        if plan.checks is not None:
            cb = plan.checks
            dq = _dev_quads(f, cb.quads, p)
            import jax.numpy as jnp

            from ..fields.limbs import ints_to_limbs

            lin_coef = f.to_mont(
                jnp.asarray(ints_to_limbs([int(c) % p for c in cb.lin_coef], f.nl))
            )
            lr = jnp.asarray(cb.lin_rows)
            lc = jnp.asarray(cb.lin_cols)

            def check(W):
                lhs = _eval_quads(f, dq, W)
                vals = f.mul_(lin_coef, jnp.take(W, lc, axis=0))
                sums = jax.ops.segment_sum(
                    vals, lr, num_segments=dq["k"], indices_are_sorted=True
                )
                rhs = f.reduce_wide_(sums)
                return jnp.all(lhs == rhs, axis=-1)

            check_fn = jax.jit(check)

        cache["segments"] = seg_fns
        cache["check"] = check_fn
        cache["f"] = f
        return cache

    def _execute_plan(self, prog, plan: _Plan, inputs, log_stream) -> Witness:
        import jax
        import jax.numpy as jnp

        from ..fields.limbs import ints_to_limbs, limbs_to_ints
        from .interpreter import execute_solver

        p = prog.field.P
        comp = self._compiled(plan, prog)
        f = comp["f"]

        # initial dense witness: ~one at 0, inputs at arg_idx
        W = f.zeros((plan.num_dense,))
        W = W.at[0].set(f.ones_mont(()))
        if len(inputs):
            in_arr = f.to_mont(
                jnp.asarray(ints_to_limbs([int(v) % p for v in inputs], f.nl))
            )
            W = W.at[jnp.asarray(plan.arg_idx)].set(in_arr)

        for seg_fn, host in zip(comp["segments"], plan.host_groups):
            W = seg_fn(W)
            if host:
                # evaluate inputs from current witness on host (rare path)
                Wh = np.asarray(jax.device_get(f.from_mont(W)))
                vals = limbs_to_ints(Wh)
                wit = {plan.var_of_dense[i]: vals[i] for i in range(len(vals))}
                upd_idx, upd_vals = [], []
                for d, out_idx in host:
                    ins = [
                        _host_quad(wit, q, p) for q in d.inputs
                    ]
                    res = execute_solver(d.solver, ins, prog.field, prog.solvers)
                    upd_idx += out_idx
                    upd_vals += [v % p for v in res]
                upd = f.to_mont(jnp.asarray(ints_to_limbs(upd_vals, f.nl)))
                W = W.at[jnp.asarray(np.asarray(upd_idx, np.int32))].set(upd)

        if comp["check"] is not None:
            ok = np.asarray(jax.device_get(comp["check"](W)))
            if not ok.all():
                first = int(np.argmin(ok))
                raise UnsatisfiedConstraint(plan.checks.errors[first])

        Wh = np.asarray(jax.device_get(f.from_mont(W)))
        vals = limbs_to_ints(Wh)
        witness = {plan.var_of_dense[i]: vals[i] for i in range(len(vals))}

        if log_stream is not None and plan.logs:
            from .interpreter import _format_log_value, evaluate_lin

            for stmt in plan.logs:
                parts = stmt.format_string.split("{}")
                out = [parts[0]]
                for (ty, lins), part in zip(stmt.expressions, parts[1:]):
                    lvals = [evaluate_lin(witness, l, p) for l in lins]
                    out.append(_format_log_value(ty, lvals))
                    out.append(part)
                log_stream.write("".join(out) + "\n")

        return Witness(witness)


def _host_quad(wit: Dict[int, int], q: QuadComb, p: int) -> int:
    def lin(l: LinComb) -> int:
        return sum(c * wit[v] for v, c in l.terms) % p

    return lin(q.left) * lin(q.right) % p
