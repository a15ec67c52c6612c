"""The compiler core: check + monomorphize + unroll + flatten in one walk.

Architectural departure from the reference (documented in SURVEY.md §7):
instead of the 17-pass middle-end (zokrates_analysis) followed by a
separate flattener (zokrates_codegen), we evaluate the typed program once
with concrete generics — constant folding, loop unrolling, function
inlining and R1CS emission happen in a single recursive walk over the
untyped AST, using lang/flatten.py's gadget library. Generic functions are
type-checked per instantiation (like C++ templates); main is always
concrete so all reachable code gets checked.

Module resolution follows zokrates_fs_resolver semantics: relative imports
against the importing file's directory, bare paths against the stdlib root;
"EMBED" provides compiler intrinsics (zokrates_ast/common/embed.rs:40-55).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple, Union

from ..ir.program import LinComb, LogStatement, Parameter, Prog, QuadComb, Solver, var_public
from . import ast as A
from .flatten import (
    ArrayVal,
    BoolVal,
    FieldVal,
    FlattenError,
    Flattener,
    StructVal,
    TupleVal,
    UintVal,
    Value,
    leaves,
    rebuild,
)
from .parser import _AsmBlock, parse_module
from .types import BOOL, FIELD, U8, U16, U32, U64, ArrayT, BoolT, CType, FieldT, StructT, TupleT, UintT


class CompileError(Exception):
    def __init__(self, msg, span=None, path=None):
        loc = f"{path or ''}:{span[0]}:{span[1]}: " if span else ""
        super().__init__(f"{loc}{msg}")
        self.span = span


MAX_LOOP = 1 << 20  # reference zokrates_analysis/src/reducer/mod.rs:51


@dataclass
class Symbol:
    kind: str          # 'function' | 'struct' | 'const' | 'alias' | 'embed'
    module: "ModuleCtx" = None
    functions: List[A.Function] = None
    struct: A.StructDef = None
    const: A.ConstDef = None
    alias: A.TypeAlias = None
    embed: str = None


class ModuleCtx:
    def __init__(self, module: A.Module, resolver, evaluator):
        self.module = module
        self.resolver = resolver
        self.ev = evaluator
        self.symbols: Dict[str, Symbol] = {}
        self._const_cache: Dict[str, Value] = {}
        self._populate()

    def _populate(self):
        m = self.module
        for name, fns in m.functions.items():
            self.symbols[name] = Symbol("function", self, functions=list(fns))
        for name, s in m.structs.items():
            self.symbols[name] = Symbol("struct", self, struct=s)
        for name, c in m.constants.items():
            self.symbols[name] = Symbol("const", self, const=c)
        for name, t in m.type_aliases.items():
            self.symbols[name] = Symbol("alias", self, alias=t)
        for imp in m.imports:
            if imp.module == "EMBED":
                for src, alias in imp.symbols:
                    self.symbols[alias] = Symbol("embed", self, embed=src)
                continue
            target = self.ev.load_module(imp.module, importing=self.module.path)
            for src, alias in imp.symbols:
                if src not in target.symbols:
                    raise CompileError(
                        f"symbol {src} not found in module {imp.module}", imp.span, m.path
                    )
                sym = target.symbols[src]
                if alias in self.symbols and sym.kind == "function" and self.symbols[alias].kind == "function":
                    self.symbols[alias].functions += sym.functions
                else:
                    self.symbols[alias] = sym

    def lookup(self, name: str) -> Optional[Symbol]:
        return self.symbols.get(name)

    def const_value(self, name: str) -> Value:
        if name not in self._const_cache:
            sym = self.symbols[name]
            assert sym.kind == "const"
            ctx = sym.module
            ty = ctx.ev.concretize_type(sym.const.ty, ctx, {})
            val = ctx.ev.eval_expr(sym.const.value, _Frame(ctx, {}, {}), expected=ty)
            val = ctx.ev.coerce(val, ty, sym.const.span)
            for leaf in leaves(val):
                if leaf.lin.try_constant(ctx.ev.flat.p) is None:
                    raise CompileError(f"constant {name} is not constant", sym.const.span)
            self._const_cache[name] = val
        return self._const_cache[name]


class _Frame:
    """One inlined call frame: variable environment + generic assignments."""

    __slots__ = ("ctx", "env", "generics")

    def __init__(self, ctx: ModuleCtx, env: Dict[str, Value], generics: Dict[str, int]):
        self.ctx = ctx
        self.env = env
        self.generics = generics


class _Return(Exception):
    def __init__(self, value: Optional[Value]):
        self.value = value


class Evaluator:
    def __init__(self, field_cls, resolver, curve: str):
        self.F = field_cls
        self.curve = curve
        self.resolver = resolver
        self.flat = Flattener(field_cls)
        self.modules: Dict[str, ModuleCtx] = {}
        self.abi = {"inputs": [], "output": {"type": "tuple", "components": {"elements": []}}}
        self.log_enabled = True

    # -- module system -----------------------------------------------------
    def load_module(self, path: str, importing: Optional[str] = None) -> ModuleCtx:
        resolved, source = self.resolver(path, importing)
        if resolved in self.modules:
            return self.modules[resolved]
        module = parse_module(source, resolved)
        if module.pragma_curve and module.pragma_curve != self.curve:
            raise CompileError(
                f"module {resolved} is compiled for curve {module.pragma_curve}, not {self.curve}"
            )
        ctx = ModuleCtx(module, self.resolver, self)
        self.modules[resolved] = ctx
        return ctx

    # -- types -------------------------------------------------------------
    def concretize_type(self, t: A.TypeNode, ctx: ModuleCtx, generics: Dict[str, int], env=None) -> CType:
        if isinstance(t, A.BasicType):
            return {
                "field": FIELD,
                "bool": BOOL,
                "u8": U8,
                "u16": U16,
                "u32": U32,
                "u64": U64,
            }[t.name]
        if isinstance(t, A.ArrayType):
            size = self.const_u32(t.size, ctx, generics, env)
            return ArrayT(self.concretize_type(t.element, ctx, generics, env), size)
        if isinstance(t, A.TupleType):
            return TupleT(tuple(self.concretize_type(e, ctx, generics, env) for e in t.elements))
        if isinstance(t, A.UserType):
            sym = ctx.lookup(t.name)
            if sym is None:
                raise CompileError(f"unknown type {t.name}")
            gen_args = []
            if t.generics:
                for g in t.generics:
                    if g is None:
                        raise CompileError(f"`_` not allowed in type {t.name} here")
                    gen_args.append(self.const_u32(g, ctx, generics, env))
            if sym.kind == "struct":
                sd = sym.struct
                genv = dict(zip(sd.generics, gen_args))
                if len(sd.generics) != len(gen_args):
                    raise CompileError(
                        f"struct {t.name} expects {len(sd.generics)} generics, got {len(gen_args)}"
                    )
                members = tuple(
                    (n, self.concretize_type(mt, sym.module, genv)) for n, mt in sd.fields
                )
                return StructT(sd.name, members, tuple(gen_args))
            if sym.kind == "alias":
                al = sym.alias
                genv = dict(zip(al.generics, gen_args))
                return self.concretize_type(al.target, sym.module, genv)
            raise CompileError(f"{t.name} is not a type")
        raise CompileError(f"unsupported type node {t}")

    def const_u32(self, e: A.Expr, ctx: ModuleCtx, generics: Dict[str, int], env=None) -> int:
        v = self.eval_expr(e, _Frame(ctx, env or {}, generics), expected=U32)
        leaf = leaves(v)[0]
        c = leaf.lin.try_constant(self.flat.p)
        if c is None:
            raise CompileError("expected a compile-time constant", e.span)
        return c

    # -- value coercion ----------------------------------------------------
    def coerce(self, v: Value, ty: CType, span=None) -> Value:
        """Check v against ty; untyped int literals appear as FieldVal
        placeholders flagged via _untyped."""
        if getattr(v, "_untyped", False):
            c = v.lin.try_constant(self.flat.p)
            return self.make_literal(c, ty, span)
        if isinstance(ty, ArrayT) and isinstance(v, ArrayVal):
            if v.ty.length != ty.length:
                raise CompileError(f"expected {ty}, got {v.ty}", span)
            items = [self.coerce(i, ty.element, span) for i in v.items]
            return ArrayVal(ty.element, items)
        if isinstance(ty, TupleT) and isinstance(v, TupleVal):
            if len(v.items) != len(ty.elements):
                raise CompileError(f"expected {ty}, got {v.ty}", span)
            return TupleVal([self.coerce(i, t, span) for i, t in zip(v.items, ty.elements)])
        if v.ty != ty:
            raise CompileError(f"expected {ty}, got {v.ty}", span)
        return v

    def make_literal(self, c: int, ty: CType, span=None) -> Value:
        if isinstance(ty, FieldT):
            return self.flat.f_const(c)
        if isinstance(ty, UintT):
            if c >= (1 << ty.width):
                raise CompileError(f"literal {c} does not fit in u{ty.width}", span)
            return self.flat.u_const(c, ty.width)
        if isinstance(ty, BoolT):
            raise CompileError(f"expected bool, got integer literal {c}", span)
        raise CompileError(f"expected {ty}, got integer literal {c}", span)

    def _untyped_const(self, c: int) -> Value:
        v = self.flat.f_const(c)
        v._untyped = True
        return v

    # -- main entry --------------------------------------------------------
    def compile_main(self, path: str) -> Prog:
        ctx = self.load_module(path)
        sym = ctx.lookup("main")
        if sym is None or sym.kind != "function":
            raise CompileError("no main function found")
        if len(sym.functions) != 1:
            raise CompileError("multiple main functions")
        fn = sym.functions[0]
        if fn.generics:
            raise CompileError("main cannot have generic parameters")

        flat = self.flat
        env: Dict[str, Value] = {}
        arguments: List[Parameter] = []
        abi_inputs = []
        for p in fn.params:
            ty = self.concretize_type(p.ty, sym.module, {})
            private = p.private if p.private is not None else False
            size = ty.size()
            vals = []
            for _ in range(size):
                wire = flat.new_var()
                arguments.append(Parameter(wire, private))
                vals.append(wire)
            env[p.name] = self._value_from_wires(ty, iter(vals))
            abi_inputs.append({"name": p.name, "public": not private, "type": ty.abi()})

        ret_ty = self.concretize_type(fn.return_ty, sym.module, {}) if fn.return_ty else TupleT(())
        frame = _Frame(sym.module, env, {})
        ret_val: Optional[Value] = None
        try:
            self.exec_block(fn.body, frame)
        except _Return as r:
            ret_val = r.value

        out_count = 0
        if ret_ty.size() > 0:
            if ret_val is None:
                raise CompileError("missing return value in main")
            ret_val = self.coerce(ret_val, ret_ty, fn.span)
            out_leaves = leaves(ret_val)
            for i, leaf in enumerate(out_leaves):
                lin = leaf.lin
                if isinstance(leaf, UintVal):
                    lin = flat.u_reduce(leaf).lin
                flat.constraint(QuadComb.from_lin(lin), LinComb.from_var(var_public(i)))
            out_count = len(out_leaves)

        self.abi = {"inputs": abi_inputs, "output": ret_ty.abi()}
        return Prog(
            curve=self.curve,
            arguments=arguments,
            return_count=out_count,
            statements=flat.statements,
        )

    def _value_from_wires(self, ty: CType, wires) -> Value:
        if isinstance(ty, FieldT):
            return FieldVal(LinComb.from_var(next(wires)))
        if isinstance(ty, BoolT):
            # booleanity of boolean inputs is constrained at entry
            lin = LinComb.from_var(next(wires))
            self.flat.constraint(QuadComb(lin, lin), lin)
            return BoolVal(lin)
        if isinstance(ty, UintT):
            return UintVal(LinComb.from_var(next(wires)), ty.width, (1 << ty.width) - 1)
        if isinstance(ty, ArrayT):
            return ArrayVal(ty.element, [self._value_from_wires(ty.element, wires) for _ in range(ty.length)])
        if isinstance(ty, TupleT):
            return TupleVal([self._value_from_wires(e, wires) for e in ty.elements])
        if isinstance(ty, StructT):
            return StructVal(ty, {n: self._value_from_wires(t, wires) for n, t in ty.members})
        raise CompileError(f"unsupported parameter type {ty}")

    # -- statements --------------------------------------------------------
    def exec_block(self, stmts: Sequence[A.Stmt], frame: _Frame):
        for s in stmts:
            self.exec_stmt(s, frame)

    def exec_stmt(self, s: A.Stmt, frame: _Frame):
        if isinstance(s, A.Return):
            val = self.eval_expr(s.value, frame) if s.value is not None else None
            raise _Return(val)
        if isinstance(s, A.Definition):
            if s.ty is not None:
                ty = self.concretize_type(s.ty, frame.ctx, frame.generics, frame.env)
                val = self.eval_expr(s.value, frame, expected=ty)
                val = self.coerce(val, ty, s.span)
                frame.env[s.assignee.name] = val
            else:
                self._assign(s.assignee, s.value, frame, s.span)
            return
        if isinstance(s, A.Assertion):
            self._exec_assert(s, frame)
            return
        if isinstance(s, A.For):
            start = self.const_u32(s.start, frame.ctx, frame.generics, frame.env)
            end = self.const_u32(s.end, frame.ctx, frame.generics, frame.env)
            if end - start > MAX_LOOP:
                raise CompileError(f"loop of size {end - start} exceeds 2^20", s.span)
            var_ty = self.concretize_type(s.var_ty, frame.ctx, frame.generics, frame.env)
            for i in range(start, end):
                frame.env[s.var] = self.make_literal(i, var_ty, s.span)
                self.exec_block(s.body, frame)
            frame.env.pop(s.var, None)
            return
        if isinstance(s, A.Log):
            if self.log_enabled:
                args = [self.eval_expr(e, frame) for e in s.args]
                exprs = []
                for v in args:
                    lins = []
                    for leaf in leaves(v):
                        lin = leaf.lin
                        if isinstance(leaf, UintVal):
                            lin = self.flat.u_reduce(leaf).lin
                        lins.append(lin)
                    exprs.append((v.ty.abi(), lins))
                self.flat.statements.append(LogStatement(s.format_string, exprs))
            return
        if isinstance(s, _AsmBlock):
            for inner in s.stmts:
                self._exec_asm(inner, frame)
            return
        raise CompileError(f"unsupported statement {type(s).__name__}", s.span)

    def _exec_assert(self, s: A.Assertion, frame: _Frame):
        e = s.condition
        msg = s.message
        # fast-path: equality asserts become direct constraints
        if isinstance(e, A.BinaryOp) and e.op == "==":
            a = self.eval_expr(e.left, frame)
            b = self.eval_expr(e.right, frame, expected=a.ty if not getattr(a, "_untyped", False) else None)
            a, b = self._unify(a, b, s.span)
            self.flat.assert_eq(a, b, msg or self._err(s.span, frame))
            return
        cond = self.eval_expr(e, frame, expected=BOOL)
        if not isinstance(cond, BoolVal):
            raise CompileError("assertion must be boolean", s.span)
        self.flat.assert_true(cond, msg or self._err(s.span, frame))

    def _err(self, span, frame) -> str:
        return f"{frame.ctx.module.path}:{span[0]}:{span[1]}"

    def _exec_asm(self, s: A.Stmt, frame: _Frame):
        flat = self.flat
        if isinstance(s, A.AsmConstraint):
            lhs = self.eval_expr(s.lhs, frame)
            rhs = self.eval_expr(s.rhs, frame)
            lhs, rhs = self._unify(lhs, rhs, s.span)
            flat.assert_eq(lhs, rhs, self._err(s.span, frame))
            return
        if isinstance(s, A.AsmAssign):
            # <-- unconstrained witness assignment via a Zir-style solver:
            # evaluate the expression *symbolically at witness time*. We
            # implement it by evaluating the RHS as usual but through
            # field-only operations which are all deterministic; the
            # difference from `=` is that `<--` must not add constraints,
            # so we run the RHS evaluation with constraint emission
            # captured and convert the result into a directive.
            val, solver_fn, input_lins = self._eval_unconstrained(s.value, frame)
            out = flat.new_var()
            flat.directive(input_lins, [out], Solver("Zir", solver_fn))
            res = FieldVal(LinComb.from_var(out))
            if s.constrained:
                lhs_cur = self.eval_expr(s.assignee, frame) if not isinstance(s.assignee, A.Ident) or s.assignee.name in frame.env else None
                # <== means: assign and constrain equality
                self._store(s.assignee, res, frame, s.span)
                rhs2 = self.eval_expr(s.value, frame)
                flat.assert_eq(res, rhs2, self._err(s.span, frame))
            else:
                self._store(s.assignee, res, frame, s.span)
            return
        raise CompileError("unsupported asm statement", s.span)

    def _eval_unconstrained(self, e: A.Expr, frame: _Frame):
        """Build a witness-time solver closure for an asm <-- expression."""
        # collect the field-typed free variables in the expression
        names: List[str] = []

        def walk(x):
            if isinstance(x, A.Ident) and x.name in frame.env and x.name not in names:
                names.append(x.name)
            for f in getattr(x, "__dataclass_fields__", {}):
                v = getattr(x, f)
                if isinstance(v, A.Expr):
                    walk(v)
                elif isinstance(v, list):
                    for item in v:
                        it = item[1] if isinstance(item, tuple) else item
                        if isinstance(it, A.Expr):
                            walk(it)

        walk(e)
        input_lins = []
        for n in names:
            v = frame.env[n]
            if not isinstance(v, (FieldVal, BoolVal, UintVal)):
                raise CompileError("asm <-- supports scalar inputs only", e.span)
            input_lins.append(v.lin)

        ev = self

        def solver_fn(inputs, field_cls):
            p = field_cls.P
            sub_flat = Flattener(field_cls)
            sub_ev = Evaluator(field_cls, ev.resolver, ev.curve)
            sub_ev.flat = sub_flat
            env = {}
            for n, val in zip(names, inputs):
                env[n] = FieldVal(LinComb.constant(val % p))
            sub_frame = _Frame(frame.ctx, env, dict(frame.generics))
            out = sub_ev.eval_expr(e, sub_frame)
            c = leaves(out)[0].lin.try_constant(p)
            if c is None:
                raise FlattenError("asm <-- expression did not fold to a constant")
            return [c]

        solver_fn.params = names
        return None, solver_fn, input_lins

    def _assign(self, target: A.Expr, value_expr: A.Expr, frame: _Frame, span):
        # find root identifier and expected type of the target
        cur = self.eval_expr(target, frame)
        val = self.eval_expr(value_expr, frame, expected=cur.ty)
        val = self.coerce(val, cur.ty, span)
        self._store(target, val, frame, span)

    def _store(self, target: A.Expr, val: Value, frame: _Frame, span):
        if isinstance(target, A.Ident):
            if target.name not in frame.env:
                raise CompileError(f"undeclared variable {target.name}", span)
            frame.env[target.name] = val
            return
        if isinstance(target, A.Index):
            base = self.eval_expr(target.base, frame)
            if not isinstance(base, ArrayVal):
                raise CompileError("cannot index non-array", span)
            if isinstance(target.index, A.RangeExpr):
                raise CompileError("cannot assign to a slice", span)
            idx = self.const_u32(target.index, frame.ctx, frame.generics, frame.env)
            if idx >= base.ty.length:
                raise CompileError(f"index {idx} out of bounds", span)
            new_items = list(base.items)
            new_items[idx] = val
            self._store(target.base, ArrayVal(base.ty.element, new_items), frame, span)
            return
        if isinstance(target, A.Member):
            base = self.eval_expr(target.base, frame)
            if not isinstance(base, StructVal):
                raise CompileError("cannot access member of non-struct", span)
            vals = dict(base.values)
            vals[target.name] = val
            self._store(target.base, StructVal(base.ty, vals), frame, span)
            return
        if isinstance(target, A.TupleMember):
            base = self.eval_expr(target.base, frame)
            if not isinstance(base, TupleVal):
                raise CompileError("cannot access element of non-tuple", span)
            items = list(base.items)
            items[target.index] = val
            self._store(target.base, TupleVal(items), frame, span)
            return
        raise CompileError("invalid assignment target", span)

    # -- expressions -------------------------------------------------------
    def _unify(self, a: Value, b: Value, span):
        """Resolve untyped literals between two operands."""
        au = getattr(a, "_untyped", False)
        bu = getattr(b, "_untyped", False)
        if au and not bu:
            c = a.lin.try_constant(self.flat.p)
            a = self.make_literal(c, b.ty if not isinstance(b.ty, BoolT) else FIELD, span)
        elif bu and not au:
            c = b.lin.try_constant(self.flat.p)
            b = self.make_literal(c, a.ty if not isinstance(a.ty, BoolT) else FIELD, span)
        elif au and bu:
            ca = a.lin.try_constant(self.flat.p)
            cb = b.lin.try_constant(self.flat.p)
            a, b = self.flat.f_const(ca), self.flat.f_const(cb)
        return a, b

    def eval_expr(self, e: A.Expr, frame: _Frame, expected: Optional[CType] = None) -> Value:
        v = self._eval_expr(e, frame, expected)
        if expected is not None and getattr(v, "_untyped", False):
            c = v.lin.try_constant(self.flat.p)
            if isinstance(expected, (FieldT, UintT)):
                return self.make_literal(c, expected, e.span)
        return v

    def _eval_expr(self, e: A.Expr, frame: _Frame, expected: Optional[CType]) -> Value:
        flat = self.flat
        if isinstance(e, A.IntLiteral):
            if e.suffix == "field":
                return flat.f_const(e.value)
            if e.suffix:
                return flat.u_const(e.value, int(e.suffix[1:]))
            if expected is not None and isinstance(expected, (FieldT, UintT)):
                return self.make_literal(e.value, expected, e.span)
            return self._untyped_const(e.value)
        if isinstance(e, A.BoolLiteral):
            return flat.b_const(e.value)
        if isinstance(e, A.Ident):
            if e.name in frame.env:
                return frame.env[e.name]
            if e.name in frame.generics:
                return flat.u_const(frame.generics[e.name], 32)
            sym = frame.ctx.lookup(e.name)
            if sym is not None and sym.kind == "const":
                return sym.module.const_value(e.name)
            if sym is not None and sym.kind == "embed" and sym.embed == "FIELD_SIZE_IN_BITS":
                return flat.u_const(self.F.BITS, 32)
            raise CompileError(f"undefined identifier {e.name}", e.span, frame.ctx.module.path)
        if isinstance(e, A.UnaryOp):
            v = self.eval_expr(e.operand, frame, expected)
            if e.op == "not":
                if isinstance(v, BoolVal):
                    return flat.b_not(v)
                if isinstance(v, UintVal):
                    return flat.u_not(v)
                raise CompileError("! expects bool or uint", e.span)
            if e.op == "pos":
                return v
            if e.op == "neg":
                if getattr(v, "_untyped", False):
                    c = v.lin.try_constant(flat.p)
                    return self._untyped_const(-c % flat.p)
                if isinstance(v, FieldVal):
                    return flat.f_neg(v)
                raise CompileError("unary - expects field", e.span)
        if isinstance(e, A.BinaryOp):
            return self._eval_binop(e, frame, expected)
        if isinstance(e, A.Ternary):
            return self._eval_ternary(e, frame, expected)
        if isinstance(e, A.InlineArray):
            return self._eval_inline_array(e, frame, expected)
        if isinstance(e, A.ArrayRepeat):
            count = self.const_u32(e.count, frame.ctx, frame.generics, frame.env)
            elem_expected = expected.element if isinstance(expected, ArrayT) else None
            v = self.eval_expr(e.value, frame, expected=elem_expected)
            if getattr(v, "_untyped", False) and elem_expected is not None:
                v = self.coerce(v, elem_expected, e.span)
            return ArrayVal(v.ty, [v] * count)
        if isinstance(e, A.InlineTuple):
            expects = expected.elements if isinstance(expected, TupleT) else [None] * len(e.items)
            items = [self.eval_expr(x, frame, expected=t) for x, t in zip(e.items, expects)]
            return TupleVal(items)
        if isinstance(e, A.InlineStruct):
            sym = frame.ctx.lookup(e.name)
            if sym is None or sym.kind != "struct":
                raise CompileError(f"unknown struct {e.name}", e.span)
            if isinstance(expected, StructT) and expected.name == e.name:
                sty = expected
            else:
                # infer generics from member values is not supported; need
                # concrete struct (non-generic) here
                if sym.struct.generics:
                    raise CompileError(
                        f"cannot infer generics for struct {e.name} literal", e.span
                    )
                sty = self.concretize_type(A.UserType(e.name, None), frame.ctx, frame.generics)
            values = {}
            given = dict(e.members)
            if set(given) != {n for n, _ in sty.members}:
                raise CompileError(f"struct {e.name} literal fields mismatch", e.span)
            for n, t in sty.members:
                values[n] = self.coerce(self.eval_expr(given[n], frame, expected=t), t, e.span)
            return StructVal(sty, values)
        if isinstance(e, A.Index):
            return self._eval_index(e, frame, expected)
        if isinstance(e, A.Member):
            base = self.eval_expr(e.base, frame)
            if not isinstance(base, StructVal):
                raise CompileError(f"member access on non-struct {base.ty}", e.span)
            if e.name not in base.values:
                raise CompileError(f"no member {e.name} on {base.ty}", e.span)
            return base.values[e.name]
        if isinstance(e, A.TupleMember):
            base = self.eval_expr(e.base, frame)
            if not isinstance(base, TupleVal):
                raise CompileError(f"tuple access on {base.ty}", e.span)
            if e.index >= len(base.items):
                raise CompileError(f"tuple index {e.index} out of range", e.span)
            return base.items[e.index]
        if isinstance(e, A.Call):
            return self._eval_call(e, frame, expected)
        raise CompileError(f"unsupported expression {type(e).__name__}", e.span)

    def _eval_inline_array(self, e: A.InlineArray, frame: _Frame, expected):
        elem_expected = expected.element if isinstance(expected, ArrayT) else None
        items: List[Value] = []
        for kind, x in e.items:
            if kind == "s":
                v = self.eval_expr(x, frame)
                if not isinstance(v, ArrayVal):
                    raise CompileError("spread expects an array", e.span)
                items += v.items
            else:
                items.append(self.eval_expr(x, frame, expected=elem_expected))
        if not items:
            raise CompileError("empty array literal needs a type", e.span)
        # unify untyped literals against the first typed element
        elem_ty = elem_expected
        if elem_ty is None:
            for it in items:
                if not getattr(it, "_untyped", False):
                    elem_ty = it.ty
                    break
            if elem_ty is None:
                elem_ty = FIELD
        items = [
            self.coerce(it, elem_ty, e.span) if getattr(it, "_untyped", False) else it
            for it in items
        ]
        for it in items:
            if it.ty != elem_ty:
                raise CompileError(f"array element type mismatch: {it.ty} vs {elem_ty}", e.span)
        return ArrayVal(elem_ty, items)

    def _eval_index(self, e: A.Index, frame: _Frame, expected):
        base = self.eval_expr(e.base, frame)
        if not isinstance(base, ArrayVal):
            raise CompileError(f"cannot index {base.ty}", e.span)
        if isinstance(e.index, A.RangeExpr):
            start = (
                self.const_u32(e.index.start, frame.ctx, frame.generics, frame.env)
                if e.index.start is not None
                else 0
            )
            end = (
                self.const_u32(e.index.end, frame.ctx, frame.generics, frame.env)
                if e.index.end is not None
                else base.ty.length
            )
            if not (0 <= start <= end <= base.ty.length):
                raise CompileError(f"slice {start}..{end} out of bounds", e.span)
            return ArrayVal(base.ty.element, base.items[start:end])
        idx_val = self.eval_expr(e.index, frame, expected=U32)
        c = leaves(idx_val)[0].lin.try_constant(self.flat.p)
        if c is not None:
            if c >= base.ty.length:
                raise CompileError(f"index {c} out of bounds for {base.ty}", e.span)
            return base.items[c]
        # dynamic index: linear scan select (reference flattens select() the
        # same way via stdlib or VariableWriteRemover muxes)
        if not isinstance(idx_val, (UintVal, FieldVal)):
            raise CompileError("index must be an integer", e.span)
        result = base.items[0]
        some = self.flat
        for i in range(1, base.ty.length):
            if isinstance(idx_val, UintVal):
                cond = some.u_eq(idx_val, some.u_const(i, idx_val.width))
            else:
                cond = some.f_eq(idx_val, some.f_const(i))
            result = some.select(cond, base.items[i], result)
        return result

    def _eval_ternary(self, e: A.Ternary, frame: _Frame, expected):
        cond = self.eval_expr(e.cond, frame, expected=BOOL)
        if not isinstance(cond, BoolVal):
            raise CompileError("condition must be boolean", e.span)
        cc = self.flat.const_of(cond)
        if cc is not None and not e.then_stmts and not e.else_stmts:
            return self.eval_expr(e.then_expr if cc else e.else_expr, frame, expected)
        # evaluate both branches under a guard for assertion semantics
        self.flat.conditions.append(cond)
        saved = dict(frame.env)
        self.exec_block(e.then_stmts, frame)
        then_v = self.eval_expr(e.then_expr, frame, expected)
        frame.env = saved
        self.flat.conditions[-1] = self.flat.b_not(cond)
        saved2 = dict(frame.env)
        self.exec_block(e.else_stmts, frame)
        else_v = self.eval_expr(e.else_expr, frame, expected)
        frame.env = saved2
        self.flat.conditions.pop()
        then_v, else_v = self._unify(then_v, else_v, e.span)
        if then_v.ty != else_v.ty:
            raise CompileError(
                f"branch types differ: {then_v.ty} vs {else_v.ty}", e.span
            )
        return self.flat.select(cond, then_v, else_v)

    def _eval_binop(self, e: A.BinaryOp, frame: _Frame, expected):
        flat = self.flat
        op = e.op
        if op in ("&&", "||"):
            a = self.eval_expr(e.left, frame, expected=BOOL)
            b = self.eval_expr(e.right, frame, expected=BOOL)
            if not isinstance(a, BoolVal) or not isinstance(b, BoolVal):
                raise CompileError(f"{op} expects booleans", e.span)
            return flat.b_and(a, b) if op == "&&" else flat.b_or(a, b)

        hint = expected if op in ("+", "-", "*", "/", "**", "%", "|", "&", "^", "<<", ">>") else None
        a = self.eval_expr(e.left, frame, expected=hint)
        bexp = hint
        if bexp is None and not getattr(a, "_untyped", False) and op not in ("<<", ">>", "**"):
            bexp = a.ty if isinstance(a, (FieldVal, UintVal)) else None
        if op in ("<<", ">>", "**"):
            b = self.eval_expr(e.right, frame, expected=U32)
        else:
            b = self.eval_expr(e.right, frame, expected=bexp)
        a, b = self._unify(a, b, e.span)

        if op == "**":
            if not isinstance(a, FieldVal):
                raise CompileError("** expects a field base", e.span)
            exp = leaves(b)[0].lin.try_constant(flat.p)
            if exp is None:
                raise CompileError("** exponent must be a compile-time constant", e.span)
            return flat.f_pow(a, exp)

        if isinstance(a, FieldVal) and isinstance(b, FieldVal):
            if op == "+":
                return flat.f_add(a, b)
            if op == "-":
                return flat.f_sub(a, b)
            if op == "*":
                return flat.f_mul(a, b)
            if op == "/":
                return flat.f_div(a, b)
            if op == "==":
                return flat.f_eq(a, b)
            if op == "!=":
                return flat.b_not(flat.f_eq(a, b))
            if op == "<":
                return flat.f_lt(a, b)
            if op == ">":
                return flat.f_lt(b, a)
            if op == "<=":
                return flat.b_not(flat.f_lt(b, a))
            if op == ">=":
                return flat.b_not(flat.f_lt(a, b))
            raise CompileError(f"operator {op} not supported on field", e.span)

        if op in ("<<", ">>") and isinstance(a, UintVal):
            k = leaves(b)[0].lin.try_constant(flat.p)
            if k is None:
                raise CompileError("shift amount must be a constant", e.span)
            return flat.u_shift(a, k, op == "<<")

        if isinstance(a, UintVal) and isinstance(b, UintVal):
            if a.width != b.width:
                raise CompileError(f"uint width mismatch u{a.width} vs u{b.width}", e.span)
            if op == "+":
                return flat.u_add(a, b)
            if op == "-":
                return flat.u_sub(a, b)
            if op == "*":
                return flat.u_mul(a, b)
            if op == "/":
                return flat.u_div_rem(a, b)[0]
            if op == "%":
                return flat.u_div_rem(a, b)[1]
            if op in ("&", "|", "^"):
                return flat.u_bitwise(a, b, {"&": "and", "|": "or", "^": "xor"}[op])
            if op == "==":
                return flat.u_eq(a, b)
            if op == "!=":
                return flat.b_not(flat.u_eq(a, b))
            if op == "<":
                return flat.u_lt(a, b)
            if op == ">":
                return flat.u_lt(b, a)
            if op == "<=":
                return flat.b_not(flat.u_lt(b, a))
            if op == ">=":
                return flat.b_not(flat.u_lt(a, b))
            raise CompileError(f"operator {op} not supported on uints", e.span)

        if op in ("<<", ">>") and isinstance(a, UintVal):
            k = leaves(b)[0].lin.try_constant(flat.p)
            if k is None:
                raise CompileError("shift amount must be a constant", e.span)
            return flat.u_shift(a, k, op == "<<")

        if isinstance(a, BoolVal) and isinstance(b, BoolVal):
            if op == "==":
                return flat.b_eq(a, b)
            if op == "!=":
                return flat.b_xor(a, b)
            if op in ("&", "|", "^"):
                return {"&": flat.b_and, "|": flat.b_or, "^": flat.b_xor}[op](a, b)
            raise CompileError(f"operator {op} not supported on bools", e.span)

        if op in ("==", "!="):
            # structural equality over arrays/tuples/structs
            if a.ty != b.ty:
                raise CompileError(f"cannot compare {a.ty} and {b.ty}", e.span)
            la, lb = leaves(a), leaves(b)
            acc = None
            for va, vb in zip(la, lb):
                if isinstance(va, UintVal):
                    c = flat.u_eq(va, vb)
                elif isinstance(va, BoolVal):
                    c = flat.b_eq(va, vb)
                else:
                    c = flat.f_eq(va, vb)
                acc = c if acc is None else flat.b_and(acc, c)
            return acc if op == "==" else flat.b_not(acc)

        raise CompileError(
            f"operator {op} not supported between {a.ty} and {b.ty}", e.span
        )

    # -- calls -------------------------------------------------------------
    def _eval_call(self, e: A.Call, frame: _Frame, expected):
        if not isinstance(e.func, A.Ident):
            raise CompileError("can only call named functions", e.span)
        name = e.func.name
        sym = frame.ctx.lookup(name)
        if sym is None:
            raise CompileError(f"undefined function {name}", e.span, frame.ctx.module.path)
        args = [self.eval_expr(a, frame) for a in e.args]
        explicit = None
        if e.generics is not None:
            explicit = [
                None if g is None else self.const_u32(g, frame.ctx, frame.generics, frame.env)
                for g in e.generics
            ]
        if sym.kind == "embed":
            return self._eval_embed(sym.embed, explicit, args, e.span, expected)
        if sym.kind != "function":
            raise CompileError(f"{name} is not a function", e.span)
        errors = []
        for fn in sym.functions:
            try:
                return self._try_call(fn, sym.module, explicit, args, expected, e.span)
            except _SignatureMismatch as m:
                errors.append(str(m))
        raise CompileError(
            f"no matching definition for {name}({', '.join(str(a.ty) for a in args)})"
            + (f" — candidates failed: {'; '.join(errors[:3])}" if errors else ""),
            e.span,
            frame.ctx.module.path,
        )

    def _try_call(self, fn: A.Function, ctx: ModuleCtx, explicit, args, expected, span):
        if len(fn.params) != len(args):
            raise _SignatureMismatch(f"arity {len(fn.params)} != {len(args)}")
        genv: Dict[str, int] = {}
        if explicit is not None:
            if len(explicit) > len(fn.generics):
                raise _SignatureMismatch("too many explicit generics")
            for g, v in zip(fn.generics, explicit):
                if v is not None:
                    genv[g] = v
        # infer generics from argument types
        for p, a in zip(fn.params, args):
            self._infer(p.ty, a.ty, genv, ctx, getattr(a, "_untyped", False))
        # infer from expected return type
        if expected is not None and fn.return_ty is not None:
            try:
                self._infer(fn.return_ty, expected, genv, ctx, False)
            except _SignatureMismatch:
                raise
        missing = [g for g in fn.generics if g not in genv]
        if missing:
            raise _SignatureMismatch(f"could not infer generics {missing}")
        # concretize parameter types and check
        coerced = []
        for p, a in zip(fn.params, args):
            try:
                pt = self.concretize_type(p.ty, ctx, genv)
            except CompileError as ce:
                raise _SignatureMismatch(str(ce))
            if getattr(a, "_untyped", False):
                a = self.coerce(a, pt, span)
            if a.ty != pt:
                raise _SignatureMismatch(f"arg type {a.ty} != {pt}")
            coerced.append(a)
        ret_ty = self.concretize_type(fn.return_ty, ctx, genv) if fn.return_ty else TupleT(())
        if expected is not None and ret_ty != expected and not isinstance(expected, TupleT):
            if ret_ty != expected:
                raise _SignatureMismatch(f"return type {ret_ty} != expected {expected}")
        # execute (inline)
        env = {p.name: a for p, a in zip(fn.params, coerced)}
        sub = _Frame(ctx, env, genv)
        try:
            self.exec_block(fn.body, sub)
        except _Return as r:
            if r.value is None:
                return TupleVal([])
            return self.coerce(r.value, ret_ty, span)
        return TupleVal([])

    def _infer(self, t: A.TypeNode, concrete: CType, genv: Dict[str, int], ctx: ModuleCtx, untyped: bool):
        """Unify syntactic type t against concrete type, filling genv."""
        if isinstance(t, A.BasicType):
            want = {"field": FieldT, "bool": BoolT}.get(t.name)
            if untyped and t.name in ("field", "u8", "u16", "u32", "u64"):
                return  # literal adapts
            if t.name == "field" and not isinstance(concrete, FieldT):
                raise _SignatureMismatch(f"field != {concrete}")
            if t.name == "bool" and not isinstance(concrete, BoolT):
                raise _SignatureMismatch(f"bool != {concrete}")
            if t.name.startswith("u") and t.name != "field":
                if not isinstance(concrete, UintT) or concrete.width != int(t.name[1:]):
                    raise _SignatureMismatch(f"{t.name} != {concrete}")
            return
        if isinstance(t, A.ArrayType):
            if not isinstance(concrete, ArrayT):
                raise _SignatureMismatch(f"array != {concrete}")
            # size: if it's a bare generic ident, bind it
            se = t.size
            if isinstance(se, A.Ident) and se.name not in ctx.symbols:
                if se.name in genv:
                    if genv[se.name] != concrete.length:
                        raise _SignatureMismatch(
                            f"generic {se.name}: {genv[se.name]} != {concrete.length}"
                        )
                else:
                    genv[se.name] = concrete.length
            else:
                try:
                    want = self.const_u32(se, ctx, genv)
                    if want != concrete.length:
                        raise _SignatureMismatch(f"array size {want} != {concrete.length}")
                except CompileError:
                    pass  # size expression uses not-yet-inferred generics
            self._infer(t.element, concrete.element, genv, ctx, untyped)
            return
        if isinstance(t, A.TupleType):
            if not isinstance(concrete, TupleT) or len(t.elements) != len(concrete.elements):
                raise _SignatureMismatch(f"tuple != {concrete}")
            for te, ce in zip(t.elements, concrete.elements):
                self._infer(te, ce, genv, ctx, untyped)
            return
        if isinstance(t, A.UserType):
            sym = ctx.lookup(t.name)
            if sym is None:
                raise _SignatureMismatch(f"unknown type {t.name}")
            if sym.kind == "alias":
                al = sym.alias
                if t.generics and al.generics:
                    sub_genv = {}
                    # map alias generics through
                    for g, ge in zip(al.generics, t.generics):
                        pass
                # expand alias syntactically with generics substituted lazily:
                # only simple (non-generic) aliases supported in inference
                if not al.generics:
                    self._infer(al.target, concrete, genv, sym.module, untyped)
                    return
                raise _SignatureMismatch("generic alias in inference position")
            if sym.kind == "struct":
                if not isinstance(concrete, StructT) or concrete.name != t.name:
                    raise _SignatureMismatch(f"{t.name} != {concrete}")
                if t.generics:
                    for gexpr, gval in zip(t.generics, concrete.generics):
                        if isinstance(gexpr, A.Ident) and gexpr.name not in ctx.symbols:
                            if gexpr.name in genv and genv[gexpr.name] != gval:
                                raise _SignatureMismatch("generic conflict")
                            genv[gexpr.name] = gval
                return
        raise _SignatureMismatch(f"cannot infer against {t}")

    # -- embeds ------------------------------------------------------------
    def _eval_embed(self, name: str, explicit, args, span, expected):
        flat = self.flat
        if name == "FIELD_SIZE_IN_BITS":
            return flat.u_const(self.F.BITS, 32)
        if name == "unpack":
            if explicit and explicit[0] is not None:
                n = explicit[0]
            elif isinstance(expected, ArrayT):
                n = expected.length
            else:
                raise CompileError("unpack needs explicit bit count", span)
            (a,) = args
            if not isinstance(a, FieldVal):
                a = FieldVal(a.lin)
            bits = flat.decompose(a.lin, n)
            return ArrayVal(BOOL, bits)
        if name == "field_to_bool_unsafe":
            (a,) = args
            return BoolVal(a.lin)
        if name == "bit_array_le":
            a, b = args
            return self._bit_array_le(a, b, span)
        m = _UINT_EMBED.match(name) if hasattr(_UINT_EMBED, "match") else None
        if name.endswith("_to_bits"):
            w = int(name[1 : -len("_to_bits")])
            (a,) = args
            if not isinstance(a, UintVal) or a.width != w:
                raise CompileError(f"{name} expects u{w}, got {a.ty}", span)
            return ArrayVal(BOOL, flat.u_bits(a))
        if name.endswith("_from_bits"):
            w = int(name[1 : -len("_from_bits")])
            (a,) = args
            if not isinstance(a, ArrayVal) or a.ty.length != w:
                raise CompileError(f"{name} expects bool[{w}], got {a.ty}", span)
            return flat.u_from_bits(a.items, w)
        if name == "sha256round":
            from .embeds import sha256_round_embed

            return sha256_round_embed(self, args, span)
        if name == "snark_verify_bls12_377":
            raise CompileError("snark_verify_bls12_377 embed not yet supported", span)
        raise CompileError(f"unknown EMBED symbol {name}", span)

    def _bit_array_le(self, a: ArrayVal, b: ArrayVal, span) -> BoolVal:
        """a <= b as big-endian bit arrays (used by stdlib checked unpack for
        field range checks): a <= b iff no position i has (prefix equal and
        a_i > b_i)."""
        flat = self.flat
        gt = flat.b_const(False)
        eq = flat.b_const(True)
        for ba, bb in zip(a.items, b.items):
            gt = flat.b_or(gt, flat.b_and(eq, flat.b_and(ba, flat.b_not(bb))))
            eq = flat.b_and(eq, flat.b_not(flat.b_xor(ba, bb)))
        return flat.b_not(gt)


class _SignatureMismatch(Exception):
    pass


_UINT_EMBED = None
