"""Untyped AST for the ZoKrates language (reference zokrates_ast::untyped).

Nodes carry (line, col) spans for error reporting and the constraint
heat-map profiler. The tree is produced by lang/parser.py from the Lark
parse tree and consumed by lang/evaluator.py (check + monomorphize +
flatten in one walk).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Union

Span = Tuple[int, int]  # (line, col)


# -- types (syntactic) -------------------------------------------------------


@dataclass
class TypeNode:
    pass


@dataclass
class BasicType(TypeNode):
    name: str  # field | bool | u8 | u16 | u32 | u64


@dataclass
class ArrayType(TypeNode):
    element: TypeNode
    size: "Expr"


@dataclass
class TupleType(TypeNode):
    elements: List[TypeNode]


@dataclass
class UserType(TypeNode):
    name: str
    generics: Optional[List[Optional["Expr"]]] = None  # None entry = '_'


# -- expressions -------------------------------------------------------------


@dataclass
class Expr:
    span: Span = field(default=(0, 0), compare=False)


@dataclass
class IntLiteral(Expr):
    value: int = 0
    suffix: Optional[str] = None  # u8|u16|u32|u64|f|None (untyped)


@dataclass
class BoolLiteral(Expr):
    value: bool = False


@dataclass
class Ident(Expr):
    name: str = ""


@dataclass
class BinaryOp(Expr):
    op: str = ""
    left: Expr = None
    right: Expr = None


@dataclass
class UnaryOp(Expr):
    op: str = ""  # neg | not | pos
    operand: Expr = None


@dataclass
class Ternary(Expr):
    cond: Expr = None
    then_stmts: List["Stmt"] = field(default_factory=list)
    then_expr: Expr = None
    else_stmts: List["Stmt"] = field(default_factory=list)
    else_expr: Expr = None


@dataclass
class Call(Expr):
    func: Expr = None
    generics: Optional[List[Optional[Expr]]] = None
    args: List[Expr] = field(default_factory=list)


@dataclass
class Index(Expr):
    base: Expr = None
    index: Union[Expr, "RangeExpr"] = None


@dataclass
class RangeExpr(Expr):
    start: Optional[Expr] = None
    end: Optional[Expr] = None


@dataclass
class Member(Expr):
    base: Expr = None
    name: str = ""


@dataclass
class TupleMember(Expr):
    base: Expr = None
    index: int = 0


@dataclass
class InlineArray(Expr):
    items: List[Tuple[str, Expr]] = field(default_factory=list)  # ('e'|'s', expr)


@dataclass
class ArrayRepeat(Expr):
    value: Expr = None
    count: Expr = None


@dataclass
class InlineTuple(Expr):
    items: List[Expr] = field(default_factory=list)


@dataclass
class InlineStruct(Expr):
    name: str = ""
    members: List[Tuple[str, Expr]] = field(default_factory=list)


# -- statements --------------------------------------------------------------


@dataclass
class Stmt:
    span: Span = field(default=(0, 0), compare=False)


@dataclass
class Return(Stmt):
    value: Optional[Expr] = None


@dataclass
class Definition(Stmt):
    ty: Optional[TypeNode] = None     # None for re-assignment to assignee
    mutable: bool = False
    assignee: Expr = None             # Ident or Index/Member chain
    value: Expr = None


@dataclass
class Assertion(Stmt):
    condition: Expr = None
    message: Optional[str] = None


@dataclass
class For(Stmt):
    var_ty: TypeNode = None
    var: str = ""
    start: Expr = None
    end: Expr = None
    body: List[Stmt] = field(default_factory=list)


@dataclass
class Log(Stmt):
    format_string: str = ""
    args: List[Expr] = field(default_factory=list)


@dataclass
class AsmAssign(Stmt):
    assignee: Expr = None
    value: Expr = None
    constrained: bool = False  # True for <==, False for <--


@dataclass
class AsmConstraint(Stmt):
    lhs: Expr = None
    rhs: Expr = None


# -- declarations ------------------------------------------------------------


@dataclass
class Param:
    ty: TypeNode
    name: str
    private: Optional[bool] = None  # None = default (private for main)
    mutable: bool = False
    span: Span = (0, 0)


@dataclass
class Function:
    name: str
    generics: List[str]
    params: List[Param]
    return_ty: Optional[TypeNode]
    body: List[Stmt]
    span: Span = (0, 0)


@dataclass
class StructDef:
    name: str
    generics: List[str]
    fields: List[Tuple[str, TypeNode]]
    span: Span = (0, 0)


@dataclass
class ConstDef:
    name: str
    ty: TypeNode
    value: Expr
    span: Span = (0, 0)


@dataclass
class TypeAlias:
    name: str
    generics: List[str]
    target: TypeNode
    span: Span = (0, 0)


@dataclass
class Import:
    module: str                      # import path string
    symbols: List[Tuple[str, str]]   # (source name, local alias)
    span: Span = (0, 0)


@dataclass
class Module:
    path: str
    pragma_curve: Optional[str]
    imports: List[Import]
    functions: Dict[str, List[Function]]  # name -> overloads (by signature)
    structs: Dict[str, StructDef]
    constants: Dict[str, ConstDef]
    type_aliases: Dict[str, TypeAlias]
