"""Flattening gadget library: typed runtime values -> R1CS statements.

This module collapses the reference's ZIR + codegen layers
(zokrates_codegen/src/lib.rs — flatten_statement / flatten_field_expression /
get_bits_unchecked + bits_cache) into a direct gadget library used by the
evaluator while it walks the typed program:

  * field values are affine LinCombs; only true products allocate wires,
  * booleans are LinCombs constrained to {0,1},
  * uints carry a max-value bound and a lazily-populated bit cache
    (the UintOptimizer equivalent: reduce only when bits are needed or a
    bound approaches the field size),
  * bit decompositions go through a cache keyed on the canonical LinComb
    (reference bits_cache, codegen/lib.rs:141) so repeated decompositions
    are free.

Every gadget documents its constraint count; the reference's
max_constraint_count budgets in the JSON corpus are the acceptance tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional, Sequence, Tuple, Union

from ..ir.program import (
    Constraint,
    Directive,
    LinComb,
    LogStatement,
    Parameter,
    Prog,
    QuadComb,
    Solver,
    var_new,
    var_public,
)
from .types import BOOL, FIELD, ArrayT, BoolT, CType, FieldT, StructT, TupleT, UintT


class FlattenError(Exception):
    pass


# -- runtime values ---------------------------------------------------------


class Value:
    ty: CType


class FieldVal(Value):
    __slots__ = ("lin",)

    ty = FIELD

    def __init__(self, lin: LinComb):
        self.lin = lin

    def __repr__(self):
        return f"FieldVal({self.lin})"


class BoolVal(Value):
    __slots__ = ("lin",)

    ty = BOOL

    def __init__(self, lin: LinComb):
        self.lin = lin

    def __repr__(self):
        return f"BoolVal({self.lin})"


class UintVal(Value):
    __slots__ = ("lin", "ty", "vmax", "bits")

    def __init__(self, lin: LinComb, width: int, vmax: int, bits=None):
        self.lin = lin
        self.ty = UintT(width)
        self.vmax = vmax
        self.bits = bits  # list[BoolVal] MSB-first, len == width, or None

    @property
    def width(self):
        return self.ty.width

    def __repr__(self):
        return f"UintVal({self.lin}, w={self.width}, max={self.vmax})"


class ArrayVal(Value):
    __slots__ = ("ty", "items")

    def __init__(self, elem_ty: CType, items: List[Value]):
        self.ty = ArrayT(elem_ty, len(items))
        self.items = items


class TupleVal(Value):
    __slots__ = ("ty", "items")

    def __init__(self, items: List[Value]):
        self.ty = TupleT(tuple(v.ty for v in items))
        self.items = items


class StructVal(Value):
    __slots__ = ("ty", "values")

    def __init__(self, ty: StructT, values: Dict[str, Value]):
        self.ty = ty
        self.values = values


def leaves(v: Value) -> List[Value]:
    if isinstance(v, (FieldVal, BoolVal, UintVal)):
        return [v]
    if isinstance(v, (ArrayVal, TupleVal)):
        out = []
        for item in v.items:
            out += leaves(item)
        return out
    if isinstance(v, StructVal):
        out = []
        for name, _ in v.ty.members:
            out += leaves(v.values[name])
        return out
    raise FlattenError(f"not a value: {v!r}")


def rebuild(ty: CType, leaf_iter) -> Value:
    """Inverse of leaves(): build a Value of type ty consuming scalars."""
    if isinstance(ty, (FieldT, BoolT, UintT)):
        return next(leaf_iter)
    if isinstance(ty, ArrayT):
        return ArrayVal(ty.element, [rebuild(ty.element, leaf_iter) for _ in range(ty.length)])
    if isinstance(ty, TupleT):
        return TupleVal([rebuild(e, leaf_iter) for e in ty.elements])
    if isinstance(ty, StructT):
        return StructVal(ty, {n: rebuild(t, leaf_iter) for n, t in ty.members})
    raise FlattenError(f"cannot rebuild {ty}")


# -- the flattener ----------------------------------------------------------


class Flattener:
    def __init__(self, field_cls):
        self.F = field_cls
        self.p = field_cls.P
        self.statements: List = []
        self._next = 0
        self.bits_cache: Dict[tuple, List[LinComb]] = {}
        # condition stack for branch-guarded assertions
        self.conditions: List[BoolVal] = []
        self._cond_product: Dict[int, LinComb] = {}
        # source span (module_idx, line, col) stamped on every emitted
        # statement — set by the evaluator per executed source statement
        # (reference threads Option<Span> from pest to IR, ir/mod.rs:37-38)
        self.current_span = None

    # -- wires -------------------------------------------------------------
    def new_var(self) -> int:
        v = var_new(self._next)
        self._next += 1
        return v

    def constraint(self, quad: QuadComb, lin: LinComb, error: Optional[str] = None):
        self.statements.append(Constraint(quad, lin, error, span=self.current_span))

    def directive(self, inputs: List[LinComb], outputs: List[int], solver: Solver):
        self.statements.append(
            Directive(
                [QuadComb.from_lin(l) for l in inputs],
                outputs,
                solver,
                span=self.current_span,
            )
        )

    # -- helpers -----------------------------------------------------------
    def reduce_lin(self, lin: LinComb) -> LinComb:
        return lin.reduce(self.p)

    def const_of(self, v: Union[FieldVal, BoolVal, UintVal]) -> Optional[int]:
        return v.lin.try_constant(self.p)

    def f_const(self, c: int) -> FieldVal:
        return FieldVal(LinComb.constant(c % self.p))

    def b_const(self, c: bool) -> BoolVal:
        return BoolVal(LinComb.constant(1 if c else 0))

    def u_const(self, c: int, width: int) -> UintVal:
        c %= 1 << width
        return UintVal(LinComb.constant(c), width, c)

    def _mul_wire(self, l: LinComb, r: LinComb, error=None) -> LinComb:
        """Allocate t with l*r == t (1 constraint)."""
        t = self.new_var()
        self.constraint(QuadComb(l, r), LinComb.from_var(t), error)
        return LinComb.from_var(t)

    # -- quadratic forms (reference zir lqc.rs canonicalization) -----------
    @staticmethod
    def _lin_ratio(a: LinComb, b: LinComb, p: int):
        """If b == k*a (as reduced lincombs), return k, else None."""
        ta = dict(a.terms)
        tb = dict(b.terms)
        if set(ta) != set(tb) or not ta:
            return None
        k = None
        for v, ca in ta.items():
            cb = tb[v]
            ratio = cb * pow(ca, -1, p) % p
            if k is None:
                k = ratio
            elif k != ratio:
                return None
        return k

    def emit_quad_eq(self, linear: LinComb, products, rhs: LinComb, error=None):
        """Constrain linear + sum(L_i * R_i) == rhs using as few wires as
        possible: proportional product sides merge, one product rides the
        constraint itself, the rest get wires."""
        p = self.p
        # split constants out of each product and merge proportional ones
        norm = []
        for L, R in products:
            L = self.reduce_lin(L)
            R = self.reduce_lin(R)
            kl = dict(L.terms).get(0, 0)
            kr = dict(R.terms).get(0, 0)
            Lv = self.reduce_lin(L - LinComb.constant(kl))
            Rv = self.reduce_lin(R - LinComb.constant(kr))
            linear = self.reduce_lin(
                linear + Rv.scale(kl) + Lv.scale(kr) + LinComb.constant(kl * kr % p)
            )
            if Lv.is_zero() or Rv.is_zero():
                continue
            merged = False
            for i, (L0, R0) in enumerate(norm):
                k = self._lin_ratio(L0, Lv, p)
                if k is not None:
                    norm[i] = (L0, self.reduce_lin(R0 + Rv.scale(k)))
                    merged = True
                    break
                k = self._lin_ratio(R0, Rv, p)
                if k is not None:
                    norm[i] = (self.reduce_lin(L0 + Lv.scale(k)), R0)
                    merged = True
                    break
            if not merged:
                norm.append((Lv, Rv))
        norm = [
            (L, R)
            for (L, R) in norm
            if not (L.is_zero() or R.is_zero())
        ]
        # wires for all but the last product
        for L, R in norm[:-1]:
            linear = self.reduce_lin(linear + self._mul_wire(L, R))
        target = self.reduce_lin(rhs - linear)
        if norm:
            L, R = norm[-1]
            self.constraint(QuadComb(L, R), target, error)
        else:
            dc = target.try_constant(p)
            if dc is not None:
                if dc != 0:
                    raise FlattenError(f"assertion is always false: {error or ''}")
                return
            self.constraint(QuadComb.from_lin(linear), rhs, error)

    # -- field ops ---------------------------------------------------------
    def f_add(self, a: FieldVal, b: FieldVal) -> FieldVal:
        return FieldVal(self.reduce_lin(a.lin + b.lin))

    def f_sub(self, a: FieldVal, b: FieldVal) -> FieldVal:
        return FieldVal(self.reduce_lin(a.lin - b.lin))

    def f_neg(self, a: FieldVal) -> FieldVal:
        return FieldVal(self.reduce_lin(-a.lin))

    def f_mul(self, a: FieldVal, b: FieldVal) -> FieldVal:
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None:
            return FieldVal(self.reduce_lin(b.lin.scale(ca)))
        if cb is not None:
            return FieldVal(self.reduce_lin(a.lin.scale(cb)))
        return FieldVal(self._mul_wire(a.lin, b.lin))

    def f_div(self, a: FieldVal, b: FieldVal) -> FieldVal:
        ca, cb = self.const_of(a), self.const_of(b)
        if cb is not None:
            if cb % self.p == 0:
                raise FlattenError("division by zero constant")
            inv = pow(cb, -1, self.p)
            if ca is not None:
                return self.f_const(ca * inv)
            return FieldVal(self.reduce_lin(a.lin.scale(inv)))
        # invb = 1/b via Div directive, constrained b * invb == 1 (rejects
        # b == 0 — reference "Inverse" error); then a * invb
        invb = self.new_var()
        self.directive([LinComb.one(), b.lin], [invb], Solver("Div"))
        self.constraint(QuadComb(b.lin, LinComb.from_var(invb)), LinComb.one(), "Inverse")
        return self.f_mul(a, FieldVal(LinComb.from_var(invb)))

    def f_pow(self, a: FieldVal, e: int) -> FieldVal:
        ca = self.const_of(a)
        if ca is not None:
            return self.f_const(pow(ca, e, self.p))
        if e == 0:
            return self.f_const(1)
        # square-and-multiply on wires
        result = None
        base = a
        bits = bin(e)[2:]
        acc = a
        for bit in bits[1:]:
            acc = self.f_mul(acc, acc)
            if bit == "1":
                acc = self.f_mul(acc, base)
        return acc

    # -- booleans ----------------------------------------------------------
    def b_not(self, a: BoolVal) -> BoolVal:
        return BoolVal(self.reduce_lin(LinComb.one() - a.lin))

    def b_and(self, a: BoolVal, b: BoolVal) -> BoolVal:
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None:
            return b if ca else self.b_const(False)
        if cb is not None:
            return a if cb else self.b_const(False)
        return BoolVal(self._mul_wire(a.lin, b.lin))

    def b_or(self, a: BoolVal, b: BoolVal) -> BoolVal:
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None:
            return self.b_const(True) if ca else b
        if cb is not None:
            return self.b_const(True) if cb else a
        # c = a + b - a*b via Or directive + constraint (a)*(b) == a + b - c
        c = self.new_var()
        self.directive([a.lin, b.lin], [c], Solver("Or"))
        self.constraint(
            QuadComb(a.lin, b.lin),
            self.reduce_lin(a.lin + b.lin - LinComb.from_var(c)),
        )
        return BoolVal(LinComb.from_var(c))

    def b_xor(self, a: BoolVal, b: BoolVal) -> BoolVal:
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None:
            return self.b_not(b) if ca else b
        if cb is not None:
            return self.b_not(a) if cb else a
        # c = a + b - 2ab via Xor directive + constraint (2a)*(b) == a + b - c
        c = self.new_var()
        self.directive([a.lin, b.lin], [c], Solver("Xor"))
        self.constraint(
            QuadComb(a.lin.scale(2), b.lin),
            self.reduce_lin(a.lin + b.lin - LinComb.from_var(c)),
        )
        return BoolVal(LinComb.from_var(c))

    def b_eq(self, a: BoolVal, b: BoolVal) -> BoolVal:
        return self.b_not(self.b_xor(a, b))

    # -- equality / is_zero ------------------------------------------------
    def is_zero(self, lin: LinComb) -> BoolVal:
        """ConditionEq gadget: 1 directive + 2 constraints."""
        c = lin.try_constant(self.p)
        if c is not None:
            return self.b_const(c % self.p == 0)
        y = self.new_var()
        m = self.new_var()
        self.directive([lin], [y, m], Solver("ConditionEq"))
        self.constraint(QuadComb(lin, LinComb.from_var(m)), LinComb.from_var(y))
        self.constraint(
            QuadComb(lin, LinComb.one() - LinComb.from_var(y)), LinComb()
        )
        return BoolVal(self.reduce_lin(LinComb.one() - LinComb.from_var(y)))

    def f_eq(self, a: FieldVal, b: FieldVal) -> BoolVal:
        return self.is_zero(self.reduce_lin(a.lin - b.lin))

    # -- bit decomposition -------------------------------------------------
    def _lin_key(self, lin: LinComb) -> tuple:
        return tuple(sorted(self.reduce_lin(lin).terms))

    def decompose(self, lin: LinComb, nbits: int, cache: bool = True) -> List[BoolVal]:
        """lin -> nbits boolean wires (MSB-first) with recomposition
        constraint. Cost: nbits boolean constraints + 1 sum constraint +
        1 directive. Uniqueness holds iff nbits < field bits (for
        nbits >= bits this is the documented-unsafe unpack)."""
        c = lin.try_constant(self.p)
        if c is not None:
            if c < (1 << nbits):
                return [
                    self.b_const(bool((c >> (nbits - 1 - i)) & 1))
                    for i in range(nbits)
                ]
            # out-of-range constant: emit the runtime gadget anyway so the
            # failure surfaces at witness generation (the reference's
            # runtime_errors semantics, e.g. lt_overflow_max_plus_1_sym —
            # the recomposition constraint is unsatisfiable)
        key = (self._lin_key(lin), nbits)
        if cache and key in self.bits_cache:
            return [BoolVal(b) for b in self.bits_cache[key]]
        outs = [self.new_var() for _ in range(nbits)]
        self.directive([lin], outs, Solver("Bits", nbits))
        acc = LinComb()
        for i, o in enumerate(outs):
            b = LinComb.from_var(o)
            self.constraint(QuadComb(b, b), b)  # booleanity
            acc = acc + b.scale(1 << (nbits - 1 - i))
        self.constraint(QuadComb.from_lin(self.reduce_lin(acc)), lin, "bit decomposition")
        bits = [LinComb.from_var(o) for o in outs]
        if cache:
            self.bits_cache[key] = bits
        return [BoolVal(b) for b in bits]

    def from_bits(self, bits: Sequence[BoolVal]) -> LinComb:
        """Recompose (MSB-first) — pure wiring."""
        acc = LinComb()
        n = len(bits)
        for i, b in enumerate(bits):
            acc = acc + b.lin.scale(1 << (n - 1 - i))
        return self.reduce_lin(acc)

    # -- comparisons -------------------------------------------------------
    # Ported semantics of zokrates_codegen/src/lib.rs:300-765: the sapling
    # A.3.2.2 bitwise le-vs-constant circuit, the shifted-sub dynamic
    # comparison at safe_width = bits-2, and the cheap `enforce` variants
    # used by assertions.

    def constant_le_conditions(
        self, bits: List[BoolVal], c_bits: List[bool]
    ) -> List[BoolVal]:
        """Conditions (each must be 1) for (bits as BE number) <= c_bits.
        ~1 constraint per '1'-run boundary; [] when c is all ones."""
        assert len(bits) == len(c_bits)
        if all(c_bits):
            return []
        n = len(bits)
        size_unknown = self.b_const(True)
        conditions = []
        for i, cb in enumerate(c_bits):
            if cb:
                if i < n - 1:
                    size_unknown = self.b_and(size_unknown, bits[i])
            else:
                # or(!size_unknown, !bits[i])
                conditions.append(
                    self.b_or(self.b_not(size_unknown), self.b_not(bits[i]))
                )
        return conditions

    def _const_bits(self, c: int, width: int) -> List[bool]:
        return [bool((c >> (width - 1 - i)) & 1) for i in range(width)]

    def enforce_constant_le(self, lin: LinComb, c: int, error=None):
        """assert lin <= c (constant): decompose to bitlen(c) bits (which
        enforces lin < 2^bitlen) + le conditions + one sum constraint."""
        cl = lin.try_constant(self.p)
        if cl is not None:
            if cl > c:
                raise FlattenError(f"assertion is always false: {error or ''}")
            return
        nb = max(c.bit_length(), 1)
        bits = self.decompose(lin, nb)
        conds = self.constant_le_conditions(bits, self._const_bits(c, nb))
        self._enforce_conds(conds, error)

    def enforce_constant_lt(self, lin: LinComb, c: int, error=None):
        if c % self.p == 0:
            raise FlattenError(f"assertion is always false: {error or ''}")
        self.enforce_constant_le(lin, (c - 1) % self.p, error)

    def constant_field_le_check(self, lin: LinComb, c: int) -> BoolVal:
        """BoolVal for lin <= c (constant), total over the full field range:
        full-width decomposition + canonicity check vs p-1 + le conditions."""
        cl = lin.try_constant(self.p)
        if cl is not None:
            return self.b_const(cl <= c)
        w = self.F.BITS
        bits = self.decompose(lin, w)
        # canonicity: bits <= p - 1 (else decomposition is ambiguous)
        canon = self.constant_le_conditions(bits, self._const_bits(self.p - 1, w))
        self._enforce_conds(canon, "unique decomposition")
        conds = self.constant_le_conditions(bits, self._const_bits(c, w))
        return self._conds_value(conds)

    def lt_bounded(self, a_lin: LinComb, b_lin: LinComb, n: int) -> BoolVal:
        """a < b given both known < 2^n (n + 2 <= field bits).
        Cost: n+1 bool + 1 sum constraints."""
        ca = a_lin.try_constant(self.p)
        cb = b_lin.try_constant(self.p)
        if ca is not None and cb is not None:
            return self.b_const(ca < cb)
        d = self.reduce_lin(a_lin - b_lin + LinComb.constant(1 << n))
        bits = self.decompose(d, n + 1, cache=False)
        return self.b_not(bits[0])

    def f_lt(self, a: FieldVal, b: FieldVal) -> BoolVal:
        """Field `<` (codegen lib.rs:796-833): constant cases via the
        le-vs-constant circuit, dynamic case range-checked to bits-2."""
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            return self.b_const(ca < cb)
        if cb is not None:
            if cb == 0:
                return self.b_const(False)
            return self.constant_field_le_check(a.lin, cb - 1)
        if ca is not None:
            # ca < b  <=>  p-1-b <= p-1-ca - 1
            if ca == self.p - 1:
                return self.b_const(False)
            neg = self.reduce_lin(LinComb.constant(self.p - 1) - b.lin)
            return self.constant_field_le_check(neg, self.p - 1 - ca - 1)
        n = self.F.BITS - 2
        self.enforce_constant_lt(a.lin, 1 << n, "IncompleteDynamicRange")
        self.enforce_constant_lt(b.lin, 1 << n, "IncompleteDynamicRange")
        return self.lt_bounded(a.lin, b.lin, n)

    def f_le(self, a: FieldVal, b: FieldVal) -> BoolVal:
        """a <= b as eq + lt (codegen le_check)."""
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            return self.b_const(ca <= cb)
        if cb is not None:
            return self.constant_field_le_check(a.lin, cb)
        if ca is not None:
            neg = self.reduce_lin(LinComb.constant(self.p - 1) - b.lin)
            return self.constant_field_le_check(neg, self.p - 1 - ca)
        eq = self.f_eq(a, b)
        lt = self.f_lt(a, b)
        return BoolVal(self.reduce_lin(eq.lin + lt.lin))

    def assert_f_lt(self, a: FieldVal, b: FieldVal, error=None):
        """assert(a < b) with the cheap single-sum constant paths."""
        ca, cb = self.const_of(a), self.const_of(b)
        if cb is not None:
            self.enforce_constant_lt(a.lin, cb, error)
            return
        if ca is not None:
            neg = self.reduce_lin(LinComb.constant(self.p - 1) - b.lin)
            self.enforce_constant_lt(neg, self.p - 1 - ca, error)
            return
        self.assert_true(self.f_lt(a, b), error)

    def assert_f_le(self, a: FieldVal, b: FieldVal, error=None):
        ca, cb = self.const_of(a), self.const_of(b)
        if cb is not None:
            self.enforce_constant_le(a.lin, cb, error)
            return
        if ca is not None:
            neg = self.reduce_lin(LinComb.constant(self.p - 1) - b.lin)
            self.enforce_constant_le(neg, self.p - 1 - ca, error)
            return
        self.assert_true(self.f_le(a, b), error)

    # -- select / mux ------------------------------------------------------
    def select(self, cond: BoolVal, a: Value, b: Value) -> Value:
        cc = self.const_of(cond)
        if cc is not None:
            return a if cc else b
        la, lb = leaves(a), leaves(b)
        out = []
        for va, vb in zip(la, lb):
            if isinstance(va, UintVal):
                lin = self._mux(cond, va.lin, vb.lin)
                out.append(UintVal(lin, va.width, max(va.vmax, vb.vmax)))
            elif isinstance(va, BoolVal):
                out.append(BoolVal(self._mux(cond, va.lin, vb.lin)))
            else:
                out.append(FieldVal(self._mux(cond, va.lin, vb.lin)))
        return rebuild(a.ty, iter(out))

    def _mux(self, cond: BoolVal, a: LinComb, b: LinComb) -> LinComb:
        diff = self.reduce_lin(a - b)
        dc = diff.try_constant(self.p)
        if dc is not None:
            return self.reduce_lin(b + cond.lin.scale(dc))
        t = self._mul_wire(cond.lin, diff)
        return self.reduce_lin(b + t)

    # -- assertions --------------------------------------------------------
    def _guard(self) -> Optional[LinComb]:
        """Product of active branch conditions, or None at top level."""
        if not self.conditions:
            return None
        key = len(self.conditions)
        acc = self.conditions[0].lin
        for c in self.conditions[1:]:
            cc = c.lin.try_constant(self.p)
            if cc is not None:
                if cc == 0:
                    return LinComb()
                continue
            ac = acc.try_constant(self.p)
            if ac is not None:
                acc = c.lin if ac else LinComb()
                continue
            acc = self._mul_wire(acc, c.lin)
        return acc

    def assert_true(self, cond: BoolVal, error: Optional[str] = None):
        cc = self.const_of(cond)
        guard = self._guard()
        if guard is None:
            if cc is not None:
                if cc != 1:
                    raise FlattenError(f"assertion is always false: {error or ''}")
                return
            self.constraint(QuadComb.from_lin(cond.lin), LinComb.one(), error or "assertion")
        else:
            gc = guard.try_constant(self.p)
            if gc == 0:
                return
            if cc == 1:
                return
            # guard * (1 - cond) == 0
            self.constraint(
                QuadComb(guard, self.reduce_lin(LinComb.one() - cond.lin)),
                LinComb(),
                error or "assertion",
            )

    def assert_eq(self, a: Value, b: Value, error: Optional[str] = None):
        guard = self._guard()
        # boolean runs get packed into field chunks and compared as sums
        # (reference BooleanArrayComparator: 1 constraint per bits-1 bools)
        pairs = list(zip(leaves(a), leaves(b)))
        chunk = self.F.BITS - 1
        i = 0
        while i < len(pairs):
            va, vb = pairs[i]
            if isinstance(va, BoolVal) and isinstance(vb, BoolVal):
                j = i
                while (
                    j < len(pairs)
                    and isinstance(pairs[j][0], BoolVal)
                    and isinstance(pairs[j][1], BoolVal)
                ):
                    j += 1
                run = pairs[i:j]
                for k in range(0, len(run), chunk):
                    block = run[k : k + chunk]
                    la, lb = LinComb(), LinComb()
                    for idx, (xa, xb) in enumerate(block):
                        w = 1 << idx
                        la = la + xa.lin.scale(w)
                        lb = lb + xb.lin.scale(w)
                    self._assert_lin_eq(
                        self.reduce_lin(la), self.reduce_lin(lb), guard, error
                    )
                i = j
                continue
            la, lb = va.lin, vb.lin
            if isinstance(va, UintVal):
                va2, vb2 = self.u_reduce(va), self.u_reduce(vb)
                la, lb = va2.lin, vb2.lin
            self._assert_lin_eq(la, lb, guard, error)
            i += 1

    def _assert_lin_eq(self, la: LinComb, lb: LinComb, guard, error):
        diff = self.reduce_lin(la - lb)
        dc = diff.try_constant(self.p)
        if guard is None:
            if dc is not None:
                if dc != 0:
                    raise FlattenError(f"assertion is always false: {error or ''}")
                return
            self.constraint(QuadComb.from_lin(la), lb, error or "assertion")
        else:
            if dc == 0:
                return
            self.constraint(QuadComb(guard, diff), LinComb(), error or "assertion")

    # -- uints -------------------------------------------------------------
    def _u_safety_margin(self) -> int:
        # keep uint bounds comfortably below the unique-decomposition range
        return self.F.BITS - 2

    def u_reduce(self, v: UintVal) -> UintVal:
        """Canonicalize to [0, 2^w): decompose to bitlen(vmax) bits and keep
        the low w (reference UintOptimizer + codegen adjustment)."""
        w = v.width
        if v.vmax < (1 << w):
            return v
        nb = max(v.vmax.bit_length(), w)
        bits = self.decompose(v.lin, nb)
        low = bits[nb - w :]
        return UintVal(self.from_bits(low), w, (1 << w) - 1, low)

    def u_bits(self, v: UintVal) -> List[BoolVal]:
        v = self.u_reduce(v)
        if v.bits is None:
            bits = self.decompose(v.lin, v.width)
            v.bits = bits
        return v.bits

    def u_from_bits(self, bits: Sequence[BoolVal], width: int) -> UintVal:
        assert len(bits) == width
        return UintVal(self.from_bits(bits), width, (1 << width) - 1, list(bits))

    def _u_fit(self, v: UintVal, incoming_max: int) -> UintVal:
        """Reduce v if combining with a value bounded by incoming_max would
        overflow the safe range."""
        if (v.vmax + incoming_max).bit_length() >= self._u_safety_margin():
            return self.u_reduce(v)
        return v

    def u_add(self, a: UintVal, b: UintVal) -> UintVal:
        a = self._u_fit(a, b.vmax)
        b = self._u_fit(b, a.vmax)
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            return self.u_const(ca + cb, a.width)
        return UintVal(self.reduce_lin(a.lin + b.lin), a.width, a.vmax + b.vmax)

    def u_sub(self, a: UintVal, b: UintVal) -> UintVal:
        w = a.width
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            return self.u_const(ca - cb, w)
        b = self.u_reduce(b)  # bound b < 2^w so the offset is fixed
        a = self._u_fit(a, 1 << w)
        # a - b + 2^w >= 1 > 0
        lin = self.reduce_lin(a.lin - b.lin + LinComb.constant(1 << w))
        return UintVal(lin, w, a.vmax + (1 << w))

    def u_mul(self, a: UintVal, b: UintVal) -> UintVal:
        w = a.width
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            return self.u_const(ca * cb, w)
        # reduce so the product bound stays in range
        if (a.vmax.bit_length() + b.vmax.bit_length()) >= self._u_safety_margin():
            a = self.u_reduce(a)
            b = self.u_reduce(b)
        if self.const_of(a) is not None:
            lin = b.lin.scale(self.const_of(a))
        elif self.const_of(b) is not None:
            lin = a.lin.scale(self.const_of(b))
        else:
            lin = self._mul_wire(a.lin, b.lin)
        return UintVal(self.reduce_lin(lin), w, a.vmax * b.vmax)

    def u_div_rem(self, a: UintVal, b: UintVal) -> Tuple[UintVal, UintVal]:
        w = a.width
        a = self.u_reduce(a)
        b = self.u_reduce(b)
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            if cb == 0:
                raise FlattenError("division by zero constant")
            return self.u_const(ca // cb, w), self.u_const(ca % cb, w)
        # assert b != 0
        nz = self.is_zero(b.lin)
        self.assert_true(self.b_not(nz), "division by zero")
        q = self.new_var()
        r = self.new_var()
        self.directive([a.lin, b.lin], [q, r], Solver("EuclideanDiv"))
        qv = UintVal(LinComb.from_var(q), w, (1 << w) - 1)
        rv = UintVal(LinComb.from_var(r), w, (1 << w) - 1)
        # range-check q and r
        qv = UintVal(self.from_bits(self.decompose(qv.lin, w)), w, (1 << w) - 1)
        rv = UintVal(self.from_bits(self.decompose(rv.lin, w)), w, (1 << w) - 1)
        # a == q*b + r
        qb = self._mul_wire(qv.lin, b.lin)
        self.constraint(QuadComb.from_lin(self.reduce_lin(qb + rv.lin)), a.lin, "euclidean division")
        # r < b
        self.assert_true(self.lt_bounded(rv.lin, b.lin, w), "remainder range")
        return qv, rv

    def u_bitwise(self, a: UintVal, b: UintVal, op: str) -> UintVal:
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            ca %= 1 << a.width
            cb %= 1 << a.width
            val = {"and": ca & cb, "or": ca | cb, "xor": ca ^ cb}[op]
            return self.u_const(val, a.width)
        ba, bb = self.u_bits(a), self.u_bits(b)
        fn = {"and": self.b_and, "or": self.b_or, "xor": self.b_xor}[op]
        bits = [fn(x, y) for x, y in zip(ba, bb)]
        return self.u_from_bits(bits, a.width)

    def u_not(self, a: UintVal) -> UintVal:
        ca = self.const_of(a)
        if ca is not None:
            return self.u_const(~ca, a.width)
        bits = [self.b_not(x) for x in self.u_bits(a)]
        return self.u_from_bits(bits, a.width)

    def u_shift(self, a: UintVal, k: int, left: bool) -> UintVal:
        w = a.width
        ca = self.const_of(a)
        if ca is not None:
            return self.u_const(ca << k if left else (ca % (1 << w)) >> k, w)
        bits = self.u_bits(a)
        zero = self.b_const(False)
        k = min(k, w)
        if left:
            nb = bits[k:] + [zero] * k
        else:
            nb = [zero] * k + bits[: w - k]
        return self.u_from_bits(nb, w)

    def u_eq(self, a: UintVal, b: UintVal) -> BoolVal:
        a, b = self.u_reduce(a), self.u_reduce(b)
        return self.is_zero(self.reduce_lin(a.lin - b.lin))

    def _u_le_conds(self, a: UintVal, c: int) -> List[BoolVal]:
        bits = self.u_bits(a)
        return self.constant_le_conditions(bits, self._const_bits(c, a.width))

    def u_lt(self, a: UintVal, b: UintVal) -> BoolVal:
        a, b = self.u_reduce(a), self.u_reduce(b)
        w = a.width
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            return self.b_const(ca < cb)
        if cb is not None:
            if cb == 0:
                return self.b_const(False)
            conds = self._u_le_conds(a, cb - 1)
            return self._conds_value(conds)
        if ca is not None:
            if ca == (1 << w) - 1:
                return self.b_const(False)
            # ca < b <=> not (b <= ca)
            return self.b_not(self._conds_value(self._u_le_conds(b, ca)))
        return self.lt_bounded(a.lin, b.lin, w)

    def u_le(self, a: UintVal, b: UintVal) -> BoolVal:
        a, b = self.u_reduce(a), self.u_reduce(b)
        w = a.width
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            return self.b_const(ca <= cb)
        if cb is not None:
            return self._conds_value(self._u_le_conds(a, cb))
        if ca is not None:
            if ca == 0:
                return self.b_const(True)
            return self.b_not(self._conds_value(self._u_le_conds(b, ca - 1)))
        eq = self.u_eq(a, b)
        lt = self.u_lt(a, b)
        return BoolVal(self.reduce_lin(eq.lin + lt.lin))

    def _conds_value(self, conds: List[BoolVal]) -> BoolVal:
        if not conds:
            return self.b_const(True)
        total = LinComb()
        n = 0
        for c in conds:
            cc = self.const_of(c)
            if cc is not None:
                if cc == 0:
                    return self.b_const(False)
                continue
            total = total + c.lin
            n += 1
        if n == 0:
            return self.b_const(True)
        if n == 1:
            return BoolVal(self.reduce_lin(total))
        return self.is_zero(self.reduce_lin(total - LinComb.constant(n)))

    def _enforce_conds(self, conds: List[BoolVal], error=None):
        total = LinComb()
        n = 0
        for c in conds:
            cc = self.const_of(c)
            if cc is not None:
                if cc == 0:
                    raise FlattenError(f"assertion is always false: {error or ''}")
                continue
            total = total + c.lin
            n += 1
        if n:
            self.constraint(
                QuadComb.from_lin(LinComb()),
                self.reduce_lin(total - LinComb.constant(n)),
                error or "range check",
            )

    def assert_u_lt(self, a: UintVal, b: UintVal, error=None):
        a, b = self.u_reduce(a), self.u_reduce(b)
        cb = self.const_of(b)
        ca = self.const_of(a)
        if cb is not None and ca is None:
            if cb == 0:
                raise FlattenError(f"assertion is always false: {error or ''}")
            self._enforce_conds(self._u_le_conds(a, cb - 1), error)
            return
        self.assert_true(self.u_lt(a, b), error)

    def assert_u_le(self, a: UintVal, b: UintVal, error=None):
        a, b = self.u_reduce(a), self.u_reduce(b)
        cb = self.const_of(b)
        ca = self.const_of(a)
        if cb is not None and ca is None:
            self._enforce_conds(self._u_le_conds(a, cb), error)
            return
        self.assert_true(self.u_le(a, b), error)
