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
        self._check_declarations()

    # -- declaration-level semantic checks (reference semantics.rs) --------
    def _expr_key(self, e, gidx):
        """Canonical key of a size expression: generics by index, module
        constants by value (so `field[A]` == `field[B]` when A == B —
        compile_errors/ambiguous_generic_call)."""
        if isinstance(e, A.IntLiteral):
            return ("i", e.value)
        if isinstance(e, A.Ident):
            if e.name in gidx:
                return ("g", gidx[e.name])
            try:
                v = self.const_value(e.name)
                c = next(iter(leaves(v))).lin.try_constant(self.ev.flat.p)
                if c is not None:
                    return ("i", c)
            except Exception:
                pass
            return ("c", e.name)
        if isinstance(e, A.BinaryOp):
            return (e.op, self._expr_key(e.left, gidx), self._expr_key(e.right, gidx))
        if isinstance(e, A.UnaryOp):
            return (e.op, self._expr_key(e.operand, gidx))
        return ("?", id(e))

    def _type_key(self, t, gidx, erase: bool = False):
        """erase=True keeps only literal sizes (the reference's checker can
        distinguish literal-sized overloads but not named/generic sizes —
        examples/array_overload vs compile_errors/ambiguous_generic_call)."""

        def size_key(e):
            if not erase:
                return self._expr_key(e, gidx)
            return ("i", e.value) if isinstance(e, A.IntLiteral) else None

        if isinstance(t, A.BasicType):
            return ("b", t.name)
        if isinstance(t, A.ArrayType):
            return ("a", size_key(t.size), self._type_key(t.element, gidx, erase))
        if isinstance(t, A.TupleType):
            return ("t",) + tuple(self._type_key(x, gidx, erase) for x in t.elements)
        if isinstance(t, A.UserType):
            gens = tuple(size_key(g) for g in (t.generics or []))
            return ("u", t.name, gens)
        return ("?", repr(t))

    def _sig_key(self, fn, erase: bool = False):
        gidx = {g: i for i, g in enumerate(fn.generics or [])}
        params = tuple(self._type_key(p.ty, gidx, erase) for p in fn.params)
        ret = self._type_key(fn.return_ty, gidx, erase) if fn.return_ty else None
        return (params, ret)

    def _type_idents(self, t, acc):
        """Collect identifier names used in a type's size expressions."""
        def expr_ids(e):
            if isinstance(e, A.Ident):
                acc.add(e.name)
            elif isinstance(e, A.BinaryOp):
                expr_ids(e.left)
                expr_ids(e.right)
            elif isinstance(e, A.UnaryOp):
                expr_ids(e.operand)

        if isinstance(t, A.ArrayType):
            expr_ids(t.size)
            self._type_idents(t.element, acc)
        elif isinstance(t, A.TupleType):
            for x in t.elements:
                self._type_idents(x, acc)
        elif isinstance(t, A.UserType):
            for g in t.generics or []:
                expr_ids(g)

    def _check_declarations(self):
        m = self.module
        for name, fns in m.functions.items():
            for fn in fns:
                if name != "main":
                    for p in fn.params:
                        if p.private is not None:
                            raise CompileError(
                                "visibility modifiers are only allowed on "
                                "main's parameters",
                                fn.span,
                                m.path,
                            )
                for g in fn.generics or []:
                    # a generic conflicts only with a module-local constant
                    # declared EARLIER in the file (the reference checker is
                    # order-sensitive: struct_generic_inference declares the
                    # constant after the generic function and is legal)
                    c = m.constants.get(g)
                    if c is not None and c.span < fn.span:
                        raise CompileError(
                            f"generic parameter {g} conflicts with the "
                            "constant of the same name",
                            fn.span,
                            m.path,
                        )
            # duplicate signatures modulo generic renaming / constant values
            seen = {}
            for fn in fns:
                key = self._sig_key(fn)
                if key in seen:
                    raise CompileError(
                        f"duplicate definition of function {name} with "
                        "an equivalent signature",
                        fn.span,
                        m.path,
                    )
                seen[key] = fn
        for name, s in m.structs.items():
            gens = list(s.generics or [])
            if len(set(gens)) != len(gens):
                raise CompileError(
                    f"duplicate generic parameter on struct {name}",
                    s.span,
                    m.path,
                )
            used = set()
            for _, ft in s.fields:
                self._type_idents(ft, used)
            for g in gens:
                if g not in used:
                    raise CompileError(
                        f"unused generic parameter {g} on struct {name}",
                        s.span,
                        m.path,
                    )
            for u in used:
                if u not in gens and u not in self.symbols:
                    raise CompileError(
                        f"undeclared identifier {u} in struct {name}",
                        s.span,
                        m.path,
                    )

    def lookup(self, name: str) -> Optional[Symbol]:
        return self.symbols.get(name)

    def const_value(self, name: str) -> Value:
        if name not in self._const_cache:
            sym = self.symbols[name]
            assert sym.kind == "const"
            ctx = sym.module
            ty = ctx.ev.concretize_type(sym.const.ty, ctx, {})
            ctx.ev._in_const_def = getattr(ctx.ev, "_in_const_def", 0) + 1
            try:
                val = ctx.ev.eval_expr(
                    sym.const.value, _Frame(ctx, {}, {}), expected=ty
                )
            finally:
                ctx.ev._in_const_def -= 1
            val = ctx.ev.coerce(val, ty, sym.const.span)
            for leaf in leaves(val):
                if leaf.lin.try_constant(ctx.ev.flat.p) is None:
                    raise CompileError(f"constant {name} is not constant", sym.const.span)
            self._const_cache[name] = val
        return self._const_cache[name]


class _Frame:
    """One inlined call frame: variable environment + generic assignments."""

    __slots__ = ("ctx", "env", "generics", "ret_ty")

    def __init__(self, ctx: ModuleCtx, env: Dict[str, Value], generics: Dict[str, int], ret_ty=None):
        self.ctx = ctx
        self.env = env
        self.generics = generics
        self.ret_ty = ret_ty


class _Return(Exception):
    def __init__(self, value: Optional[Value]):
        self.value = value


def _subst_expr(e, sub):
    """Substitute Ident(name) -> sub[name] in a size expression (syntactic
    alias-generic expansion for inference)."""
    if isinstance(e, A.Ident) and e.name in sub and sub[e.name] is not None:
        return sub[e.name]
    if isinstance(e, A.BinaryOp):
        return A.BinaryOp(
            span=e.span, op=e.op, left=_subst_expr(e.left, sub),
            right=_subst_expr(e.right, sub),
        )
    if isinstance(e, A.UnaryOp):
        return A.UnaryOp(span=e.span, op=e.op, operand=_subst_expr(e.operand, sub))
    return e


def _subst_type(t, sub):
    if isinstance(t, A.ArrayType):
        return A.ArrayType(
            element=_subst_type(t.element, sub), size=_subst_expr(t.size, sub)
        )
    if isinstance(t, A.TupleType):
        return A.TupleType(elements=[_subst_type(x, sub) for x in t.elements])
    if isinstance(t, A.UserType):
        gens = (
            None
            if t.generics is None
            else [None if g is None else _subst_expr(g, sub) for g in t.generics]
        )
        return A.UserType(name=t.name, generics=gens)
    return t


def _untyped_int_expr(e) -> bool:
    """Syntactically untyped {integer} expression: unsuffixed int literals
    composed with arithmetic only (no typed leaf fixes the type)."""
    if isinstance(e, A.IntLiteral):
        return e.suffix is None
    if isinstance(e, A.UnaryOp) and e.op in ("neg", "pos"):
        return _untyped_int_expr(e.operand)
    if isinstance(e, A.BinaryOp) and e.op in ("+", "-", "*", "/", "%", "**"):
        return _untyped_int_expr(e.left) and _untyped_int_expr(e.right)
    return False


class Evaluator:
    def __init__(self, field_cls, resolver, curve: str):
        self.F = field_cls
        self.curve = curve
        self.resolver = resolver
        self.flat = Flattener(field_cls)
        self.modules: Dict[str, ModuleCtx] = {}
        self.abi = {"inputs": [], "output": {"type": "tuple", "components": {"elements": []}}}
        self.log_enabled = True
        self._scopes: List[tuple] = []
        self.witness_mode = False  # True inside asm solver closures
        # source-map registry: module path -> index into Prog.module_map
        self.module_list: List[str] = []
        self.module_ids: Dict[str, int] = {}

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
        if not getattr(v, "_untyped", False) and not (
            isinstance(v, UintVal) and v.ty.width == 32
        ):
            # sizes are u32 (compile_errors/constant_array_size_type_mismatch)
            raise CompileError(
                f"expected a u32 size expression, got {v.ty}", e.span, ctx.module.path
            )
        leaf = leaves(v)[0]
        c = leaf.lin.try_constant(self.flat.p)
        if c is None:
            raise CompileError("expected a compile-time constant", e.span)
        return c

    # -- value coercion ----------------------------------------------------
    def coerce(self, v: Value, ty: CType, span=None) -> Value:
        """Check v against ty; untyped int literals appear as FieldVal
        placeholders flagged via _untyped."""
        if getattr(v, "_untyped", False) and isinstance(v, (FieldVal, UintVal)):
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
        # frame.ret_ty None = no declared return type (an explicit `-> ()`
        # does accept `return <empty tuple>`, corpus core/tuples/empty)
        frame = _Frame(sym.module, env, {}, ret_ty if fn.return_ty else None)
        ret_val: Optional[Value] = None
        try:
            self.exec_block(fn.body, frame)
        except _Return as r:
            ret_val = r.value

        out_count = 0
        if ret_val is not None:
            # coerce even for size-0 types: struct equivalence is nominal
            # (compile_errors/no_struct_equivalence)
            ret_val = self.coerce(ret_val, ret_ty, fn.span)
        if ret_ty.size() > 0:
            if ret_val is None:
                raise CompileError("missing return value in main")
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
            module_map=list(self.module_list),
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
        for i, s in enumerate(stmts):
            if isinstance(s, A.Return) and i + 1 < len(stmts):
                raise CompileError(
                    "unreachable statements after return",
                    getattr(stmts[i + 1], "span", None),
                    frame.ctx.module.path,
                )
            self.exec_stmt(s, frame)

    def exec_scoped(self, stmts: Sequence[A.Stmt], frame: _Frame, declare=None):
        """Run statements in a lexical scope: declarations made inside are
        dropped (and shadowed outer bindings restored) on exit."""
        saved: Dict[str, Value] = {}
        declared = set()
        self._scopes.append((id(frame), saved, declared))
        try:
            if declare:
                for name, val in declare:
                    self._declare(name, frame)
                    frame.env[name] = val
            self.exec_block(stmts, frame)
        finally:
            self._scopes.pop()
            for name in declared:
                if name in saved:
                    frame.env[name] = saved[name]
                else:
                    frame.env.pop(name, None)

    def _declare(self, name: str, frame: _Frame):
        if self._scopes:
            fid, saved, declared = self._scopes[-1]
            if fid != id(frame):
                return  # declaration belongs to a different (callee) frame
            if name not in declared:
                declared.add(name)
                if name in frame.env:
                    saved[name] = frame.env[name]

    def _module_id(self, path: str) -> int:
        mid = self.module_ids.get(path)
        if mid is None:
            mid = len(self.module_list)
            self.module_ids[path] = mid
            self.module_list.append(path)
        return mid

    def exec_stmt(self, s: A.Stmt, frame: _Frame):
        # stamp the flattener with this statement's source span so every
        # constraint emitted below (incl. by nested expression evaluation)
        # maps back to it — the reference's Span/ModuleMap flow
        # (zokrates_ast common/position.rs, ir/serialize.rs:251-259)
        sp = getattr(s, "span", None)
        if sp is not None:
            self.flat.current_span = (
                self._module_id(frame.ctx.module.path),
                sp[0],
                sp[1],
            )
        if isinstance(s, A.Return):
            if s.value is not None and frame.ret_ty is None:
                raise CompileError(
                    "unexpected return value in a function returning nothing",
                    s.span,
                    frame.ctx.module.path,
                )
            val = (
                self.eval_expr(s.value, frame, expected=frame.ret_ty)
                if s.value is not None
                else None
            )
            raise _Return(val)
        if isinstance(s, A.Definition):
            if s.ty is not None:
                ty = self.concretize_type(s.ty, frame.ctx, frame.generics, frame.env)
                val = self.eval_expr(s.value, frame, expected=ty)
                val = self.coerce(val, ty, s.span)
                self._declare(s.assignee.name, frame)
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
                self.exec_scoped(
                    s.body, frame, declare=[(s.var, self.make_literal(i, var_ty, s.span))]
                )
            return
        if isinstance(s, A.Log):
            # semantic checks run regardless of --debug (the reference
            # type-checks before LogIgnorer strips): placeholder arity and
            # no unresolvable {integer} literals
            nph = s.format_string.count("{}")
            if nph != len(s.args):
                raise CompileError(
                    f"log format expects {nph} argument(s), got {len(s.args)}",
                    s.span,
                    frame.ctx.module.path,
                )
            for e in s.args:
                if _untyped_int_expr(e):
                    raise CompileError(
                        "cannot determine the type of this integer literal "
                        "expression in log",
                        getattr(e, "span", s.span),
                        frame.ctx.module.path,
                    )
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
                self.flat.statements.append(
                    LogStatement(s.format_string, exprs, span=self.flat.current_span)
                )
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
            if self._assert_quad_eq(e.left, e.right, frame, msg, s.span):
                return
            a = self.eval_expr(e.left, frame)
            b = self.eval_expr(e.right, frame, expected=a.ty if not getattr(a, "_untyped", False) else None)
            a, b = self._unify(a, b, s.span)
            self.flat.assert_eq(a, b, msg or self._err(s.span, frame))
            return
        if (
            isinstance(e, A.BinaryOp)
            and e.op in ("<", "<=", ">", ">=")
            and not self.flat.conditions
        ):
            a = self.eval_expr(e.left, frame)
            b = self.eval_expr(e.right, frame, expected=a.ty if not getattr(a, "_untyped", False) else None)
            a, b = self._unify(a, b, s.span)
            err = msg or self._err(s.span, frame)
            flat = self.flat
            if isinstance(a, FieldVal) and isinstance(b, FieldVal):
                if e.op == "<":
                    flat.assert_f_lt(a, b, err)
                elif e.op == "<=":
                    flat.assert_f_le(a, b, err)
                elif e.op == ">":
                    flat.assert_f_lt(b, a, err)
                else:
                    flat.assert_f_le(b, a, err)
                return
            if isinstance(a, UintVal) and isinstance(b, UintVal):
                if e.op == "<":
                    flat.assert_u_lt(a, b, err)
                elif e.op == "<=":
                    flat.assert_u_le(a, b, err)
                elif e.op == ">":
                    flat.assert_u_lt(b, a, err)
                else:
                    flat.assert_u_le(b, a, err)
                return
        cond = self.eval_expr(e, frame, expected=BOOL)
        if not isinstance(cond, BoolVal):
            raise CompileError("assertion must be boolean", s.span)
        self.flat.assert_true(cond, msg or self._err(s.span, frame))

    def _err(self, span, frame) -> str:
        return f"{frame.ctx.module.path}:{span[0]}:{span[1]}"

    def _quad_form(self, e, frame):
        """Try to view a field expression as linear + sum of products without
        allocating wires (reference lqc.rs). Returns (LinComb, [(L, R)]) or
        None when the expression isn't field-valued."""
        from ..ir.program import LinComb as _LC

        if isinstance(e, A.BinaryOp) and e.op in ("+", "-"):
            l = self._quad_form(e.left, frame)
            if l is None:
                return None
            r = self._quad_form(e.right, frame)
            if r is None:
                return None
            if e.op == "+":
                return (l[0] + r[0], l[1] + r[1])
            return (l[0] - r[0], l[1] + [(L, -R) for (L, R) in r[1]])
        if isinstance(e, A.UnaryOp) and e.op == "neg":
            inner = self._quad_form(e.operand, frame)
            if inner is None:
                return None
            return (-inner[0], [(L, -R) for (L, R) in inner[1]])
        if isinstance(e, A.BinaryOp) and e.op == "*":
            va = self.eval_expr(e.left, frame)
            vb = self.eval_expr(e.right, frame)
            va, vb = self._unify(va, vb, e.span)
            if getattr(va, "_untyped", False) and getattr(vb, "_untyped", False):
                ca = va.lin.try_constant(self.flat.p)
                cb = vb.lin.try_constant(self.flat.p)
                return (_LC.constant(ca * cb % self.flat.p), [])
            if not (isinstance(va, FieldVal) and isinstance(vb, FieldVal)):
                return None
            ca, cb = self.flat.const_of(va), self.flat.const_of(vb)
            if ca is not None:
                return (vb.lin.scale(ca), [])
            if cb is not None:
                return (va.lin.scale(cb), [])
            return (_LC(), [(va.lin, vb.lin)])
        v = self.eval_expr(e, frame)
        if getattr(v, "_untyped", False) and isinstance(v, (FieldVal, UintVal)):
            return (_LC.constant(v.lin.try_constant(self.flat.p)), [])
        if isinstance(v, FieldVal):
            return (v.lin, [])
        return None

    def _assert_quad_eq(self, lhs_e, rhs_e, frame, msg, span) -> bool:
        """assert(lhs == rhs) via the quadratic-form path; returns False when
        the expressions aren't plain field forms (caller falls back)."""
        if self.flat.conditions:
            return False
        l = self._quad_form(lhs_e, frame)
        if l is None:
            return False
        r = self._quad_form(rhs_e, frame)
        if r is None:
            return False
        if not (l[1] or r[1]):
            # pure linear: emit the redefinition-friendly orientation here
            # (re-evaluating via the generic path would duplicate work)
            la = self.flat.reduce_lin(l[0])
            lb = self.flat.reduce_lin(r[0])
            self.flat._assert_lin_eq(la, lb, None, msg or self._err(span, frame))
            return True
        linear = l[0] - r[0]
        products = l[1] + [(L, -R) for (L, R) in r[1]]
        from ..ir.program import LinComb as _LC

        self.flat.emit_quad_eq(linear, products, _LC(), msg or self._err(span, frame))
        return True

    def _exec_asm(self, s: A.Stmt, frame: _Frame):
        flat = self.flat
        if isinstance(s, A.AsmConstraint):
            if self._assert_quad_eq(s.lhs, s.rhs, frame, self._err(s.span, frame), s.span):
                return
            lhs = self.eval_expr(s.lhs, frame)
            rhs = self.eval_expr(s.rhs, frame)
            lhs, rhs = self._unify(lhs, rhs, s.span)
            if not (isinstance(lhs, FieldVal) and isinstance(rhs, FieldVal)):
                # `===` constrains scalar field combinations only
                # (compile_errors/assembly/unallowed_type_in_constrained_*)
                raise CompileError(
                    f"assembly constraints must be field-typed, got {lhs.ty}",
                    s.span,
                    frame.ctx.module.path,
                )
            flat.assert_eq(lhs, rhs, self._err(s.span, frame))
            return
        if isinstance(s, A.AsmAssign):
            if s.constrained:
                # `<==` lowers to `<--` + `===` (reference AssemblyTransformer):
                # the directive assigns at witness time, the constraint checks
                self._exec_asm_unconstrained(s, frame)
                self._exec_asm(A.AsmConstraint(s.span, s.assignee, s.value), frame)
                return
            self._exec_asm_unconstrained(s, frame)
            return
        raise CompileError("unsupported asm statement", s.span)

    def _exec_asm_unconstrained(self, s: A.AsmAssign, frame: _Frame):
        """`x <-- expr`: witness-time evaluation with NO constraints — the
        expression becomes a Zir solver closure run by the interpreter."""
        flat = self.flat
        tgt = s.assignee
        while isinstance(tgt, (A.Index, A.Member, A.TupleMember)):
            if isinstance(tgt, A.Index):
                try:
                    self.const_u32(tgt.index, frame.ctx, frame.generics, frame.env)
                except CompileError:
                    # (compile_errors/assembly/variable_index_assignment)
                    raise CompileError(
                        "variable array index assignment is not allowed in "
                        "assembly",
                        s.span,
                        frame.ctx.module.path,
                    )
            tgt = tgt.base
        cur = self.eval_expr(s.assignee, frame)
        if not all(isinstance(leaf, FieldVal) for leaf in leaves(cur)):
            # reference AssemblyTransformer: assembly assigns field values
            # (arrays/tuples of field are fine — corpus assembly/assignment;
            # bools are not — compile_errors/assembly/unallowed_type_*)
            raise CompileError(
                f"only field assignments are allowed in assembly, got {cur.ty}",
                s.span,
                frame.ctx.module.path,
            )
        if self.witness_mode:
            # already inside a solver closure: everything is constant, so
            # just evaluate and assign directly
            val = self.eval_expr(s.value, frame, expected=cur.ty)
            val = self.coerce(val, cur.ty, s.span)
            self._store(s.assignee, val, frame, s.span)
            return
        out_ty = cur.ty
        n_out = len(leaves(cur))

        # free variables of the expression (any in-scope value)
        names: List[str] = []

        def walk(x):
            if isinstance(x, A.Ident):
                if x.name in frame.env and x.name not in names:
                    names.append(x.name)
                return
            for fld in getattr(x, "__dataclass_fields__", {}):
                v = getattr(x, fld)
                if isinstance(v, (A.Expr, A.Stmt)):
                    walk(v)
                elif isinstance(v, list):
                    for item in v:
                        it = item[1] if isinstance(item, tuple) else item
                        if isinstance(it, (A.Expr, A.Stmt)):
                            walk(it)

        walk(s.value)

        # constant propagation (reference ZirPropagator over asm blocks,
        # corpus core/assembly/propagation/*): if every free variable is a
        # compile-time constant, evaluate the expression now and assign the
        # result directly — no directive, no witness-time solver
        if all(
            all(
                leaf.lin.try_constant(flat.p) is not None
                for leaf in leaves(frame.env[n])
            )
            for n in names
        ):
            self.witness_mode = True
            try:
                val = self.eval_expr(s.value, frame, expected=cur.ty)
            finally:
                self.witness_mode = False
            val = self.coerce(val, cur.ty, s.span)
            self._store(s.assignee, val, frame, s.span)
            return

        input_lins = []
        in_specs = []  # (name, type, leaf kinds)
        for n in names:
            v = frame.env[n]
            lf = leaves(v)
            for leaf in lf:
                lin = leaf.lin
                if isinstance(leaf, UintVal):
                    lin = flat.u_reduce(leaf).lin
                input_lins.append(lin)
            in_specs.append((n, v.ty, len(lf)))

        spec = {
            "module_path": frame.ctx.module.path,
            "expr": s.value,
            "in_specs": in_specs,
            "generics": dict(frame.generics),
            "out_ty": out_ty,
            "curve": self.curve,
            "span": s.span,
        }
        solver_fn = make_zir_solver(spec, self)
        solver_fn.params = names
        outs = [flat.new_var() for _ in range(n_out)]
        flat.directive(input_lins, outs, Solver("Zir", solver_fn))
        # rebuild a value of the assignee's type over the fresh wires;
        # asm is unsafe by design: bools/uints are trusted unconstrained
        from ..ir.program import LinComb as _LC

        leaf_vals = []
        for wire, proto in zip(outs, leaves(cur)):
            lin = _LC.from_var(wire)
            if isinstance(proto, BoolVal):
                leaf_vals.append(BoolVal(lin))
            elif isinstance(proto, UintVal):
                leaf_vals.append(UintVal(lin, proto.width, (1 << proto.width) - 1))
            else:
                leaf_vals.append(FieldVal(lin))
        val = rebuild(out_ty, iter(leaf_vals))
        self._store(s.assignee, val, frame, s.span)

    def _const_value_of_type(self, ty: CType, vals) -> Value:
        flat = self.flat
        if isinstance(ty, FieldT):
            return flat.f_const(next(vals))
        if isinstance(ty, BoolT):
            return flat.b_const(bool(next(vals)))
        if isinstance(ty, UintT):
            return flat.u_const(next(vals), ty.width)
        if isinstance(ty, ArrayT):
            return ArrayVal(ty.element, [self._const_value_of_type(ty.element, vals) for _ in range(ty.length)])
        if isinstance(ty, TupleT):
            return TupleVal([self._const_value_of_type(t, vals) for t in ty.elements])
        if isinstance(ty, StructT):
            return StructVal(ty, {n: self._const_value_of_type(t, vals) for n, t in ty.members})
        raise CompileError(f"unsupported asm type {ty}")

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
            idx_val = self.eval_expr(target.index, frame, expected=U32)
            c = leaves(idx_val)[0].lin.try_constant(self.flat.p)
            if c is not None:
                if c >= base.ty.length:
                    raise CompileError(f"index {c} out of bounds", span)
                new_items = list(base.items)
                new_items[c] = val
            else:
                # dynamic index write: per-slot mux + one-hot bounds check
                # (reference VariableWriteRemover, analysis/variable_write_
                # remover.rs — a[i] = v becomes a[j] = i == j ? v : a[j])
                if not isinstance(idx_val, (UintVal, FieldVal)):
                    raise CompileError("index must be an integer", span)
                flat = self.flat
                conds = []
                for j in range(base.ty.length):
                    if isinstance(idx_val, UintVal):
                        conds.append(
                            flat.u_eq(idx_val, flat.u_const(j, idx_val.width))
                        )
                    else:
                        conds.append(flat.f_eq(idx_val, flat.f_const(j)))
                from ..ir.program import LinComb as _LC, QuadComb as _QC

                onehot = _LC()
                for cd in conds:
                    onehot = onehot + cd.lin
                flat.constraint(
                    _QC.from_lin(flat.reduce_lin(onehot)),
                    _LC.one(),
                    "index out of bounds",
                )
                new_items = [
                    flat.select(conds[j], val, old)
                    for j, old in enumerate(base.items)
                ]
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
        if (au and not isinstance(a, (FieldVal, UintVal))) or (
            bu and not isinstance(b, (FieldVal, UintVal))
        ):
            # untyped aggregate literals ([1, 2], [[1]]): adapt to the other
            # side's type; shape mismatches are compile errors
            # (compile_errors/generics/{no_weak_eq,concrete_length_mismatch})
            if au and not bu:
                return self.coerce(a, b.ty, span), b
            if bu and not au:
                return a, self.coerce(b, a.ty, span)
            if a.ty != b.ty:
                raise CompileError(f"cannot compare {a.ty} and {b.ty}", span)
            return a, b
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
                # resolve via the ctx the lookup happened in — the name may
                # be an import alias absent from the owner module's table
                return frame.ctx.const_value(e.name)
            if sym is not None and sym.kind == "embed" and sym.embed == "FIELD_SIZE_IN_BITS":
                return flat.u_const(self.F.BITS, 32)
            raise CompileError(f"undefined identifier {e.name}", e.span, frame.ctx.module.path)
        if isinstance(e, A.UnaryOp):
            if (
                e.op in ("neg", "pos")
                and isinstance(e.operand, A.UnaryOp)
                and e.operand.op in ("neg", "pos")
            ):
                # reference grammar forbids chained sign operators
                # (compile_errors/double_negation)
                raise CompileError(
                    "unary sign operators cannot be chained",
                    e.span,
                    frame.ctx.module.path,
                )
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
                if isinstance(v, UintVal):
                    return flat.u_sub(flat.u_const(0, v.width), v)
                raise CompileError("unary - expects field or uint", e.span)
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
            arr = ArrayVal(v.ty, [v] * count)
            if getattr(v, "_untyped", False) or getattr(v, "_untyped_arr", False) or getattr(v, "_untyped", False):
                arr._untyped = True
            if getattr(v, "_untyped", False):
                arr._untyped = True
            return arr
        if isinstance(e, A.InlineTuple):
            expects = expected.elements if isinstance(expected, TupleT) else [None] * len(e.items)
            items = [self.eval_expr(x, frame, expected=t) for x, t in zip(e.items, expects)]
            return TupleVal(items)
        if isinstance(e, A.InlineStruct):
            sym = frame.ctx.lookup(e.name)
            if sym is None or sym.kind not in ("struct", "alias"):
                raise CompileError(f"unknown struct {e.name}", e.span)
            if sym.kind == "alias":
                # struct literal through a type alias (examples/alias/
                # struct_aliasing): resolve to the underlying struct; a
                # generic alias needs the expected type to fix its generics
                if isinstance(expected, StructT):
                    sty = expected
                else:
                    res = self.concretize_type(
                        A.UserType(e.name, None), frame.ctx, frame.generics
                    )
                    if not isinstance(res, StructT):
                        raise CompileError(f"{e.name} is not a struct", e.span)
                    sty = res
            elif isinstance(expected, StructT) and expected.name == e.name:
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
        all_untyped = all(getattr(it, "_untyped", False) for it in items)
        if elem_ty is None:
            for it in items:
                if not getattr(it, "_untyped", False):
                    elem_ty = it.ty
                    break
            if elem_ty is None:
                elem_ty = FIELD
        if all_untyped and elem_expected is None:
            # keep the literals adaptable: the array re-types at use site
            arr = ArrayVal(elem_ty, items)
            arr._untyped = True
            return arr
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
        # dynamic index: linear-scan mux + bounds check (reference emits the
        # same via VariableWriteRemover; sum of one-hot eq flags must be 1,
        # which rejects out-of-range indices at witness time)
        if not isinstance(idx_val, (UintVal, FieldVal)):
            raise CompileError("index must be an integer", e.span)
        flat = self.flat
        conds = []
        for i in range(base.ty.length):
            if isinstance(idx_val, UintVal):
                conds.append(flat.u_eq(idx_val, flat.u_const(i, idx_val.width)))
            else:
                conds.append(flat.f_eq(idx_val, flat.f_const(i)))
        from ..ir.program import LinComb as _LC, QuadComb as _QC

        onehot = _LC()
        for c in conds:
            onehot = onehot + c.lin
        flat.constraint(
            _QC.from_lin(flat.reduce_lin(onehot)), _LC.one(), "index out of bounds"
        )
        result = base.items[0]
        for i in range(1, base.ty.length):
            result = flat.select(conds[i], base.items[i], result)
        return result

    def _eval_ternary(self, e: A.Ternary, frame: _Frame, expected):
        cond = self.eval_expr(e.cond, frame, expected=BOOL)
        if not isinstance(cond, BoolVal):
            raise CompileError("condition must be boolean", e.span)
        cc = self.flat.const_of(cond)
        if cc is not None and not e.then_stmts and not e.else_stmts:
            return self.eval_expr(e.then_expr if cc else e.else_expr, frame, expected)
        # ZoKrates evaluates BOTH branches unconditionally; assertions inside
        # branches fire regardless of the condition (documented semantics,
        # see core/panics corpus tests)
        saved = dict(frame.env)
        self.exec_block(e.then_stmts, frame)
        then_v = self.eval_expr(e.then_expr, frame, expected)
        frame.env = saved
        saved2 = dict(frame.env)
        self.exec_block(e.else_stmts, frame)
        else_v = self.eval_expr(e.else_expr, frame, expected)
        frame.env = saved2
        then_v, else_v = self._unify(then_v, else_v, e.span)
        if then_v.ty != else_v.ty:
            raise CompileError(
                f"branch types differ: {then_v.ty} vs {else_v.ty}", e.span
            )
        return self.flat.select(cond, then_v, else_v)


    def _match_sha_pattern(self, e, frame):
        """Recognize the sha choice/majority shapes on uints and emit the
        dedicated 1-2 constraint/bit gadgets (reference ShaCh /
        ShaAndXorAndXorAnd solvers, interpreter lib.rs:283-300)."""

        def is_and(x):
            return isinstance(x, A.BinaryOp) and x.op == "&"

        def is_not(x):
            return isinstance(x, A.UnaryOp) and x.op == "not"

        def same_ident(x, y):
            return (
                isinstance(x, A.Ident) and isinstance(y, A.Ident) and x.name == y.name
            )

        # ch: (e & f) ^ (!e & g)
        if is_and(e.left) and is_and(e.right):
            l, r = e.left, e.right
            for a1, b1 in ((l.left, l.right), (l.right, l.left)):
                for a2, b2 in ((r.left, r.right), (r.right, r.left)):
                    if is_not(a2) and same_ident(a1, a2.operand):
                        ev_ = self.eval_expr(a1, frame)
                        fv = self.eval_expr(b1, frame)
                        gv = self.eval_expr(b2, frame)
                        if all(isinstance(v, UintVal) for v in (ev_, fv, gv)):
                            return self._sha_ch(ev_, fv, gv)
        # maj: ((a & b) ^ (a & c)) ^ (b & c) in any association
        terms = []

        def collect_xor(x):
            if isinstance(x, A.BinaryOp) and x.op == "^":
                collect_xor(x.left)
                collect_xor(x.right)
            else:
                terms.append(x)

        collect_xor(e)
        if len(terms) == 3 and all(is_and(t) for t in terms):
            idents = []
            for t in terms:
                pair = []
                for sub in (t.left, t.right):
                    if not isinstance(sub, A.Ident):
                        return None
                    pair.append(sub.name)
                idents.append(frozenset(pair))
            all_names = set()
            for p in idents:
                all_names |= p
            if len(all_names) == 3 and len(set(idents)) == 3:
                a_n, b_n, c_n = sorted(all_names)
                av = self.eval_expr(A.Ident((0, 0), a_n), frame)
                bv = self.eval_expr(A.Ident((0, 0), b_n), frame)
                cv = self.eval_expr(A.Ident((0, 0), c_n), frame)
                if all(isinstance(v, UintVal) for v in (av, bv, cv)):
                    return self._sha_maj(av, bv, cv)
        return None

    def _sha_ch(self, ev, fv, gv):
        from ..ir.program import LinComb as _LC, QuadComb as _QC, Solver as _So

        flat = self.flat
        eb, fb, gb = flat.u_bits(ev), flat.u_bits(fv), flat.u_bits(gv)
        out_bits = []
        for e_i, f_i, g_i in zip(eb, fb, gb):
            ce, cf, cg = flat.const_of(e_i), flat.const_of(f_i), flat.const_of(g_i)
            if ce is not None and cf is not None and cg is not None:
                out_bits.append(flat.b_const(bool((ce & cf) ^ ((1 - ce) & cg))))
                continue
            o = flat.new_var()
            flat.directive([e_i.lin, f_i.lin, g_i.lin], [o], _So("ShaCh"))
            # e*(f-g) == o - g
            flat.constraint(
                _QC(e_i.lin, flat.reduce_lin(f_i.lin - g_i.lin)),
                flat.reduce_lin(_LC.from_var(o) - g_i.lin),
            )
            out_bits.append(BoolVal(_LC.from_var(o)))
        return flat.u_from_bits(out_bits, ev.width)

    def _sha_maj(self, av, bv, cv):
        from ..ir.program import LinComb as _LC, QuadComb as _QC, Solver as _So

        flat = self.flat
        ab, bb, cb = flat.u_bits(av), flat.u_bits(bv), flat.u_bits(cv)
        out_bits = []
        for a_i, b_i, c_i in zip(ab, bb, cb):
            ca, cb_, cc = flat.const_of(a_i), flat.const_of(b_i), flat.const_of(c_i)
            if ca is not None and cb_ is not None and cc is not None:
                out_bits.append(
                    flat.b_const(bool((ca & cb_) ^ (ca & cc) ^ (cb_ & cc)))
                )
                continue
            o = flat.new_var()
            flat.directive(
                [a_i.lin, b_i.lin, c_i.lin], [o], _So("ShaAndXorAndXorAnd")
            )
            # t = b*c ; (2t - b - c)*a == t - o
            t = flat._mul_wire(b_i.lin, c_i.lin)
            flat.constraint(
                _QC(flat.reduce_lin(t.scale(2) - b_i.lin - c_i.lin), a_i.lin),
                flat.reduce_lin(t - _LC.from_var(o)),
            )
            out_bits.append(BoolVal(_LC.from_var(o)))
        return flat.u_from_bits(out_bits, av.width)

    def _eval_binop(self, e: A.BinaryOp, frame: _Frame, expected):
        flat = self.flat
        op = e.op
        if op in ("&&", "||"):
            a = self.eval_expr(e.left, frame, expected=BOOL)
            b = self.eval_expr(e.right, frame, expected=BOOL)
            if not isinstance(a, BoolVal) or not isinstance(b, BoolVal):
                raise CompileError(f"{op} expects booleans", e.span)
            return flat.b_and(a, b) if op == "&&" else flat.b_or(a, b)

        if op == "^":
            m = self._match_sha_pattern(e, frame)
            if m is not None:
                return m

        hint = expected if op in ("+", "-", "*", "/", "**", "%", "|", "&", "^") else None
        a = self.eval_expr(e.left, frame, expected=hint)
        bexp = hint
        if bexp is None and not getattr(a, "_untyped", False) and op not in ("<<", ">>", "**"):
            bexp = a.ty if isinstance(a, (FieldVal, UintVal)) else None
        if op in ("<<", ">>", "**"):
            b = self.eval_expr(e.right, frame, expected=U32)
        else:
            b = self.eval_expr(e.right, frame, expected=bexp)

        # both operands untyped literals: fold with integer semantics and
        # stay untyped so context can still pick the type
        if getattr(a, "_untyped", False) and getattr(b, "_untyped", False):
            ca = a.lin.try_constant(flat.p)
            cb = b.lin.try_constant(flat.p)
            if op in ("+", "-", "*", "**", "%", "&", "|", "^", "<<", ">>"):
                import operator as _op

                fn = {
                    "+": _op.add, "-": _op.sub, "*": _op.mul,
                    "**": lambda x, y: pow(x, y, flat.p), "%": _op.mod,
                    "&": _op.and_, "|": _op.or_, "^": _op.xor,
                    "<<": _op.lshift, ">>": _op.rshift,
                }[op]
                return self._untyped_const(fn(ca, cb) % flat.p)
            if op == "/":
                return self._untyped_const(ca * pow(cb, -1, flat.p) % flat.p)
            if op in ("==", "!=", "<", "<=", ">", ">="):
                import operator as _op

                fn = {"==": _op.eq, "!=": _op.ne, "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge}[op]
                return flat.b_const(fn(ca, cb))
        if op == "**":
            exp = leaves(b)[0].lin.try_constant(flat.p)
            if exp is None:
                raise CompileError("** exponent must be a compile-time constant", e.span)
            if getattr(a, "_untyped", False):
                ca = a.lin.try_constant(flat.p)
                return self._untyped_const(pow(ca, exp, flat.p))
            if not isinstance(a, FieldVal):
                raise CompileError("** expects a field base", e.span)
            return flat.f_pow(a, exp)

        if op in ("<<", ">>") and getattr(a, "_untyped", False):
            ca = a.lin.try_constant(flat.p)
            k = leaves(b)[0].lin.try_constant(flat.p)
            if ca is not None and k is not None:
                v = (ca << k) if op == "<<" else (ca >> k)
                return self._untyped_const(v % flat.p)

        a, b = self._unify(a, b, e.span)

        if isinstance(a, FieldVal) and isinstance(b, FieldVal):
            if op in ("&", "|", "^", "<<", ">>"):
                ca, cb = flat.const_of(a), flat.const_of(b)
                if ca is None or cb is None:
                    raise CompileError(
                        f"bitwise {op} on field requires constant operands", e.span
                    )
                import operator as _op

                fn = {"&": _op.and_, "|": _op.or_, "^": _op.xor, "<<": _op.lshift, ">>": _op.rshift}[op]
                return flat.f_const(fn(ca, cb))
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
                return flat.f_le(a, b)
            if op == ">=":
                return flat.f_le(b, a)
            raise CompileError(f"operator {op} not supported on field", e.span)

        if op in ("<<", ">>") and isinstance(a, FieldVal):
            ca = flat.const_of(a)
            k = leaves(b)[0].lin.try_constant(flat.p)
            if ca is None or k is None:
                raise CompileError("field shifts require constant operands", e.span)
            return flat.f_const((ca << k) if op == "<<" else (ca >> k))

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
                return flat.u_le(a, b)
            if op == ">=":
                return flat.u_le(b, a)
            raise CompileError(f"operator {op} not supported on uints", e.span)

        if op in ("<<", ">>") and isinstance(a, FieldVal):
            ca = flat.const_of(a)
            k = leaves(b)[0].lin.try_constant(flat.p)
            if ca is None or k is None:
                raise CompileError("field shifts require constant operands", e.span)
            return flat.f_const((ca << k) if op == "<<" else (ca >> k))

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
        if len(sym.functions) > 1:
            # the reference's checker resolves overloads without evaluating
            # generic values: two candidates whose signatures differ only in
            # size expressions are ambiguous at every call
            # (compile_errors/ambiguous_generic_call*, non_conflicting_call)
            erased = {}
            for fn in sym.functions:
                if len(fn.params) != len(args):
                    continue
                k = sym.module._sig_key(fn, erase=True)
                if k in erased:
                    raise CompileError(
                        f"ambiguous call to {name}: multiple candidates "
                        "differ only in generic/constant array sizes",
                        e.span,
                        frame.ctx.module.path,
                    )
                erased[k] = fn
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
            self._infer(p.ty, a.ty, genv, ctx, getattr(a, "_untyped", False), gnames=frozenset(fn.generics))
        # infer from expected return type
        if expected is not None and fn.return_ty is not None:
            try:
                self._infer(fn.return_ty, expected, genv, ctx, False, gnames=frozenset(fn.generics))
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
        sub = _Frame(ctx, env, genv, ret_ty if fn.return_ty else None)
        try:
            self.exec_block(fn.body, sub)
        except _Return as r:
            if r.value is None:
                return TupleVal([])
            return self.coerce(r.value, ret_ty, span)
        return TupleVal([])

    def _infer(self, t: A.TypeNode, concrete: CType, genv: Dict[str, int], ctx: ModuleCtx, untyped: bool, gnames=frozenset()):
        """Unify syntactic type t against concrete type, filling genv.
        gnames = the resolved function's declared generic names: they are
        bindable even when they shadow a module-level constant."""
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
            if isinstance(se, A.Ident) and (se.name in gnames or se.name not in ctx.symbols):
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
            self._infer(t.element, concrete.element, genv, ctx, untyped, gnames)
            return
        if isinstance(t, A.TupleType):
            if not isinstance(concrete, TupleT) or len(t.elements) != len(concrete.elements):
                raise _SignatureMismatch(f"tuple != {concrete}")
            for te, ce in zip(t.elements, concrete.elements):
                self._infer(te, ce, genv, ctx, untyped, gnames)
            return
        if isinstance(t, A.UserType):
            sym = ctx.lookup(t.name)
            if sym is None:
                raise _SignatureMismatch(f"unknown type {t.name}")
            if sym.kind == "alias":
                al = sym.alias
                if al.generics:
                    # substitute the use-site size expressions for the alias
                    # generics, then infer against the expanded target
                    # (examples/alias/basic_aliasing: fill() -> matrix<R, C>)
                    if not t.generics or len(t.generics) != len(al.generics):
                        raise _SignatureMismatch(
                            f"alias {t.name} expects {len(al.generics)} generics"
                        )
                    sub = dict(zip(al.generics, t.generics))
                    # resolve the expanded target in the alias's own module
                    # (its type names live there); caller generics still
                    # bind through gnames
                    self._infer(
                        _subst_type(al.target, sub), concrete, genv,
                        sym.module, untyped, gnames,
                    )
                    return
                self._infer(al.target, concrete, genv, sym.module, untyped, gnames)
                return
            if sym.kind == "struct":
                if not isinstance(concrete, StructT) or concrete.name != t.name:
                    raise _SignatureMismatch(f"{t.name} != {concrete}")
                if t.generics:
                    for gexpr, gval in zip(t.generics, concrete.generics):
                        if isinstance(gexpr, A.Ident) and (gexpr.name in gnames or gexpr.name not in ctx.symbols):
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
        if getattr(self, "_in_const_def", 0):
            # constants must reduce without gadget calls
            # (compile_errors/constant_reduction_fail)
            raise CompileError(
                f"embed {name} cannot be called in a constant definition", span
            )
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
            c = flat.const_of(a)
            if c is not None and c >= (1 << n):
                # explicit unpack of an oversized constant is a compile
                # error (compile_errors/unpack_value_too_large), unlike the
                # lt gadget's internal decomposition which fails at runtime
                raise CompileError(
                    f"cannot unpack constant {c} into {n} bits", span
                )
            bits = flat.decompose(a.lin, n)
            return ArrayVal(BOOL, bits)
        if name == "field_to_bool_unsafe":
            (a,) = args
            return BoolVal(a.lin)
        if name == "bit_array_le":
            a, b = args
            if any(flat.const_of(x) is None for x in b.items):
                # reference embed requires a constant comparand
                # (compile_errors/variable_constant_lt)
                raise CompileError(
                    "bit_array_le requires a constant second argument", span
                )
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
            from .embeds import snark_verify_embed

            return snark_verify_embed(self, args, span)
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


def make_zir_solver(spec, host_ev=None):
    """Build (or rebuild after deserialization) the witness-time closure for
    an `asm <--` expression. The spec is picklable: untyped AST + concrete
    types + generic bindings + the defining module's path."""

    def solver_fn(inputs, field_cls):
        from .flatten import Flattener as _Fl

        ev = solver_fn._ev
        if ev is None:
            from .compile import fs_resolver

            ev = Evaluator(field_cls, fs_resolver(), spec["curve"])
            solver_fn._ev = ev
        sub_ev = Evaluator(field_cls, ev.resolver, spec["curve"])
        sub_ev.flat = _Fl(field_cls)
        sub_ev.modules = ev.modules
        sub_ev.witness_mode = True
        ctx = sub_ev.load_module(spec["module_path"])
        env = {}
        pos = 0
        for (n, ty, cnt) in spec["in_specs"]:
            vals = inputs[pos : pos + cnt]
            pos += cnt
            env[n] = sub_ev._const_value_of_type(ty, iter(vals))
        sub_frame = _Frame(ctx, env, dict(spec["generics"]))
        out = sub_ev.eval_expr(spec["expr"], sub_frame, expected=spec["out_ty"])
        out = sub_ev.coerce(out, spec["out_ty"], spec["span"])
        res = []
        for leaf in leaves(out):
            c = leaf.lin.try_constant(field_cls.P)
            if c is None:
                raise FlattenError("asm <-- expression did not fold to a constant")
            res.append(c)
        return res

    solver_fn._ev = host_ev
    solver_fn.spec = spec
    return solver_fn


class _SignatureMismatch(Exception):
    pass


_UINT_EMBED = None
