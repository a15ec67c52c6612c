"""Parse .zok source into the untyped AST (lang/ast.py).

Equivalent of zokrates_parser + zokrates_pest_ast + untyped/from_ast.rs in
the reference, built on Lark (earley, dynamic lexer) instead of pest."""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Tuple

from lark import Lark, Token, Tree

from . import ast as A
from .grammar import GRAMMAR


class ParseError(Exception):
    def __init__(self, msg, line=None, col=None):
        self.line, self.col = line, col
        super().__init__(msg if line is None else f"{line}:{col}: {msg}")


@lru_cache(maxsize=1)
def _parser() -> Lark:
    return Lark(
        GRAMMAR,
        parser="earley",
        lexer="basic",
        propagate_positions=True,
        ambiguity="resolve",
    )


def _span(t) -> A.Span:
    if isinstance(t, Token):
        return (t.line or 0, t.column or 0)
    if isinstance(t, Tree) and t.meta and not t.meta.empty:
        return (t.meta.line, t.meta.column)
    return (0, 0)


def parse_module(source: str, path: str = "<main>") -> A.Module:
    try:
        tree = _parser().parse(source)
    except Exception as e:
        raise ParseError(f"{path}: {e}") from None
    return _Builder(path).module(tree)


class _Builder:
    def __init__(self, path: str):
        self.path = path

    # -- top level ---------------------------------------------------------
    def module(self, tree: Tree) -> A.Module:
        pragma = None
        imports: List[A.Import] = []
        functions = {}
        structs = {}
        constants = {}
        aliases = {}
        for child in tree.children:
            if not isinstance(child, Tree):
                continue
            d = child.data
            if d == "pragma":
                pragma = str(child.children[0])
            elif d == "from_import":
                module = _string(child.children[0])
                syms = []
                for s in child.children[1:]:
                    name = str(s.children[0])
                    alias = str(s.children[1]) if len(s.children) > 1 else name
                    syms.append((name, alias))
                imports.append(A.Import(module, syms, _span(child)))
            elif d == "main_import":
                module = _string(child.children[0])
                alias = (
                    str(child.children[1])
                    if len(child.children) > 1 and child.children[1] is not None
                    else module.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                )
                imports.append(A.Import(module, [("main", alias)], _span(child)))
            elif d == "const_definition":
                ty = self.ty(child.children[0])
                name = str(child.children[1])
                value = self.expr(child.children[2])
                constants[name] = A.ConstDef(name, ty, value, _span(child))
            elif d == "type_definition":
                name = str(child.children[0])
                rest = child.children[1:]
                gens = []
                if rest and isinstance(rest[0], Tree) and rest[0].data == "generics_decl":
                    gens = [str(t) for t in rest[0].children]
                    rest = rest[1:]
                aliases[name] = A.TypeAlias(name, gens, self.ty(rest[0]), _span(child))
            elif d == "struct_definition":
                name = str(child.children[0])
                rest = child.children[1:]
                gens = []
                if rest and isinstance(rest[0], Tree) and rest[0].data == "generics_decl":
                    gens = [str(t) for t in rest[0].children]
                    rest = rest[1:]
                fields = []
                for f in rest:
                    fields.append((str(f.children[1]), self.ty(f.children[0])))
                structs[name] = A.StructDef(name, gens, fields, _span(child))
            elif d == "function_definition":
                fn = self.function(child)
                functions.setdefault(fn.name, []).append(fn)
        return A.Module(self.path, pragma, imports, functions, structs, constants, aliases)

    def function(self, tree: Tree) -> A.Function:
        name = str(tree.children[0])
        rest = list(tree.children[1:])
        gens = []
        if rest and isinstance(rest[0], Tree) and rest[0].data == "generics_decl":
            gens = [str(t) for t in rest[0].children]
            rest = rest[1:]
        params_tree = rest[0]
        rest = rest[1:]
        ret_ty = None
        if rest and isinstance(rest[0], Tree) and rest[0].data != "block":
            ret_ty = self.ty(rest[0])
            rest = rest[1:]
        body = self.block(rest[0])
        params = []
        for p in params_tree.children:
            kids = list(p.children)
            private = None
            if isinstance(kids[0], Tree) and kids[0].data in ("private", "public"):
                private = kids[0].data == "private"
                kids = kids[1:]
            ty = self.ty(kids[0])
            pname = str(kids[-1])
            mutable = len(kids) > 2  # ty, "mut"?, name — mut token dropped by lark
            params.append(A.Param(ty, pname, private, mutable, _span(p)))
        return A.Function(name, gens, params, ret_ty, body, _span(tree))

    def block(self, tree: Tree) -> List[A.Stmt]:
        return [self.stmt(c) for c in tree.children]

    # -- statements --------------------------------------------------------
    def stmt(self, t: Tree) -> A.Stmt:
        d = t.data
        sp = _span(t)
        if d == "return_statement":
            val = self.expr(t.children[0]) if t.children else None
            return A.Return(sp, val)
        if d == "definition":
            lhs = t.children[0]
            kids = list(lhs.children)
            ty = self.ty(kids[0])
            name = str(kids[-1])
            mutable = len(kids) > 2
            return A.Definition(sp, ty, mutable, A.Ident(sp, name), self.expr(t.children[1]))
        if d == "assignment":
            return A.Definition(sp, None, False, self.assignee(t.children[0]), self.expr(t.children[1]))
        if d == "assert_statement":
            msg = _string(t.children[1]) if len(t.children) > 1 else None
            return A.Assertion(sp, self.expr(t.children[0]), msg)
        if d == "for_statement":
            kids = [c for c in t.children if not (isinstance(c, Token) and c.type == "MUT")]
            return A.For(
                sp,
                self.ty(kids[0]),
                str(kids[1]),
                self.expr(kids[2]),
                self.expr(kids[3]),
                self.block(kids[4]),
            )
        if d == "log_statement":
            return A.Log(sp, _string(t.children[0]), [self.expr(c) for c in t.children[1:]])
        if d == "asm_statement":
            stmts = []
            for inner in t.children:
                di = inner.data
                si = _span(inner)
                if di == "asm_assign":
                    stmts.append(
                        A.AsmAssign(si, self.assignee(inner.children[0]), self.expr(inner.children[1]), False)
                    )
                elif di == "asm_assign_constrain":
                    stmts.append(
                        A.AsmAssign(si, self.assignee(inner.children[0]), self.expr(inner.children[1]), True)
                    )
                else:
                    stmts.append(
                        A.AsmConstraint(si, self.expr(inner.children[0]), self.expr(inner.children[1]))
                    )
            return _AsmBlock(sp, stmts)
        raise ParseError(f"unknown statement {d}", *sp)

    def assignee(self, t: Tree) -> A.Expr:
        sp = _span(t)
        base: A.Expr = A.Ident(sp, str(t.children[0]))
        for acc in t.children[1:]:
            if acc.data == "a_index":
                base = A.Index(sp, base, self.range_or_expr(acc.children[0]))
            elif acc.data == "a_member":
                base = A.Member(sp, base, str(acc.children[0]))
            else:
                base = A.TupleMember(sp, base, int(str(acc.children[0])))
        return base

    # -- types -------------------------------------------------------------
    def ty(self, t) -> A.TypeNode:
        if isinstance(t, Tree):
            d = t.data
            if d == "array_ty":
                base = self.ty(t.children[0])
                for suffix in t.children[1:]:
                    pass
                # build right-to-left: T[2][3] is an array of 2 arrays of 3
                sizes = [self.expr(s.children[0]) for s in t.children[1:]]
                out = base
                for size in reversed(sizes):
                    out = A.ArrayType(out, size)
                return out
            if d == "t_field":
                return A.BasicType("field")
            if d == "t_bool":
                return A.BasicType("bool")
            if d in ("t_u8", "t_u16", "t_u32", "t_u64"):
                return A.BasicType(d[2:])
            if d == "t_user":
                name = str(t.children[0])
                gens = None
                if len(t.children) > 1 and t.children[1] is not None:
                    gens = [self.generic_value(g) for g in t.children[1].children]
                return A.UserType(name, gens)
            if d == "t_tuple_empty":
                return A.TupleType([])
            if d == "t_tuple_single":
                return A.TupleType([self.ty(t.children[0])])
            if d == "t_tuple_multi":
                return A.TupleType([self.ty(c) for c in t.children])
        raise ParseError(f"unknown type node {t}")

    def generic_value(self, g) -> Optional[A.Expr]:
        if isinstance(g, Tree):
            if g.data == "g_underscore":
                return None
            if g.data == "g_ident":
                return A.Ident(_span(g), str(g.children[0]))
            return self.expr(g)
        return self.expr(g)

    # -- expressions -------------------------------------------------------
    def range_or_expr(self, t):
        if isinstance(t, Tree) and t.data == "range":
            start = end = None
            for c in t.children:
                if isinstance(c, Tree) and c.data == "range_from":
                    start = self.expr(c.children[0])
                elif isinstance(c, Tree) and c.data == "range_to":
                    end = self.expr(c.children[0])
            return A.RangeExpr(_span(t), start, end)
        return self.expr(t)

    _BINOPS = {
        "or_op": "||", "and_op": "&&", "eq_op": "==", "ne_op": "!=",
        "le_op": "<=", "lt_op": "<", "ge_op": ">=", "gt_op": ">",
        "bitor_op": "|", "bitxor_op": "^", "bitand_op": "&",
        "lshift_op": "<<", "rshift_op": ">>", "add_op": "+", "sub_op": "-",
        "mul_op": "*", "div_op": "/", "rem_op": "%", "pow_op": "**",
    }

    def expr(self, t) -> A.Expr:
        if isinstance(t, Token):
            return self._token_expr(t)
        d = t.data
        sp = _span(t)
        if d in self._BINOPS:
            return A.BinaryOp(sp, self._BINOPS[d], self.expr(t.children[0]), self.expr(t.children[1]))
        if d == "not_op":
            return A.UnaryOp(sp, "not", self.expr(t.children[0]))
        if d == "neg_op":
            return A.UnaryOp(sp, "neg", self.expr(t.children[0]))
        if d == "pos_op":
            return A.UnaryOp(sp, "pos", self.expr(t.children[0]))
        if d == "ternary_op":
            return A.Ternary(sp, self.expr(t.children[0]), [], self.expr(t.children[1]), [], self.expr(t.children[2]))
        if d == "if_else_op":
            cond = self.expr(t.children[0])
            tb, eb = t.children[1], t.children[2]
            t_stmts = [self.stmt(c) for c in tb.children[:-1]]
            e_stmts = [self.stmt(c) for c in eb.children[:-1]]
            return A.Ternary(sp, cond, t_stmts, self.expr(tb.children[-1]), e_stmts, self.expr(eb.children[-1]))
        if d == "ident":
            return A.Ident(sp, str(t.children[0]))
        if d == "dec_literal":
            raw = str(t.children[0])
            suffix = None
            for s in ("u8", "u16", "u32", "u64"):
                if raw.endswith(s):
                    suffix = s
                    raw = raw[: -len(s)]
                    break
            else:
                if raw.endswith("f"):
                    suffix = "field"
                    raw = raw[:-1]
            raw = raw.rstrip("_")
            return A.IntLiteral(sp, int(raw), suffix)
        if d == "hex_literal":
            raw = str(t.children[0])[2:]
            width = {2: "u8", 4: "u16", 8: "u32", 16: "u64"}.get(len(raw))
            if width is None:
                raise ParseError(f"invalid hex literal width 0x{raw}", *sp)
            return A.IntLiteral(sp, int(raw, 16), width)
        if d == "true_literal":
            return A.BoolLiteral(sp, True)
        if d == "false_literal":
            return A.BoolLiteral(sp, False)
        if d == "index_op":
            return A.Index(sp, self.expr(t.children[0]), self.range_or_expr(t.children[1]))
        if d == "call_op":
            args = [self.expr(c) for c in t.children[1].children]
            return A.Call(sp, self.expr(t.children[0]), None, args)
        if d == "call_generic_op":
            gens = [self.generic_value(g) for g in t.children[1].children]
            args = [self.expr(c) for c in t.children[2].children]
            return A.Call(sp, self.expr(t.children[0]), gens, args)
        if d == "member_op":
            return A.Member(sp, self.expr(t.children[0]), str(t.children[1]))
        if d == "tuple_member_op":
            return A.TupleMember(sp, self.expr(t.children[0]), int(str(t.children[1])))
        if d == "tuple_empty":
            return A.InlineTuple(sp, [])
        if d == "tuple_single":
            return A.InlineTuple(sp, [self.expr(t.children[0])])
        if d == "tuple_multi":
            return A.InlineTuple(sp, [self.expr(c) for c in t.children])
        if d == "struct_expr":
            name = str(t.children[0])
            members = [(str(m.children[0]), self.expr(m.children[1])) for m in t.children[1:]]
            return A.InlineStruct(sp, name, members)
        if d == "array_expr":
            items = []
            for c in t.children:
                if isinstance(c, Tree) and c.data == "spread":
                    items.append(("s", self.expr(c.children[0])))
                else:
                    items.append(("e", self.expr(c)))
            return A.InlineArray(sp, items)
        if d == "repeat_expr":
            return A.ArrayRepeat(sp, self.expr(t.children[0]), self.expr(t.children[1]))
        raise ParseError(f"unknown expression node {d}", *sp)

    def _token_expr(self, t: Token) -> A.Expr:
        sp = (t.line or 0, t.column or 0)
        if t.type == "NAME":
            return A.Ident(sp, str(t))
        raise ParseError(f"unexpected token {t.type} {t}", *sp)


class _AsmBlock(A.Stmt):
    """Container statement for an asm block's inner statements."""

    def __init__(self, span, stmts):
        super().__init__(span)
        self.stmts = stmts


def _string(tok) -> str:
    s = str(tok)
    return s[1:-1]
