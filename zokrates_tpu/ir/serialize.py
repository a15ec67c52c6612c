"""Binary program format (`out` artifact).

Layout mirrors the reference (zokrates_ast/src/ir/serialize.rs):

  header: magic b"ZOK\\0" | version [3,0,0,0] | curve id (4 bytes,
          sha256(modulus LE)[0:4]) | constraint_count u32 LE |
          return_count u32 LE | 4 sections x (type u32 LE, offset u64 LE,
          length u64 LE)
  sections: Parameters, Constraints (stream of CBOR statements), Solvers,
          Modules — serde_cbor conventions: structs as string-keyed maps,
          enums externally tagged, field elements as canonical-LE byte
          strings, Option as null/value.

Serialization runs the UnconstrainedVariableDetector (ir/check.rs:
programs with unconstrained witness variables are rejected) and the
SolverIndexer (repeated Zir solvers become Ref{index} — ir/solver_indexer.rs).
"""

from __future__ import annotations

import io
from typing import List, Optional, Tuple

from ..fields.field import FIELDS
from ..fields.params import curve_id
from ..utils import cbor
from .program import Constraint, Directive, LinComb, LogStatement, Parameter, Prog, QuadComb, Solver

MAGIC = b"\x5a\x4f\x4b\x00"
VERSION = bytes([3, 0, 0, 0])

_SECTION_IDS = {"parameters": 1, "constraints": 2, "solvers": 3, "modules": 4}


class SerializationError(Exception):
    pass


def _field_bytes(v: int, field) -> bytes:
    return field(v).to_byte_vector()


def _module_hash(path: str) -> int:
    """Deterministic 64-bit module id (the reference keys its ModuleMap by a
    std-hasher u64 of the path, common/position.rs:24-32; we use
    sha256(path)[0:8] — a documented divergence, the id is only a lookup
    key resolved against the same file's map)."""
    import hashlib

    return int.from_bytes(hashlib.sha256(path.encode()).digest()[:8], "little")


def _span_to_cbor(span, module_map):
    """(module_idx, line, col) -> reference Span::Source CBOR shape
    (common/position.rs SourceSpan: module hash + from/to positions)."""
    if span is None or module_map is None:
        return None
    mid, line, col = span
    if mid >= len(module_map):
        return None
    pos = {"line": line, "col": col}
    return {"Source": {"module": _module_hash(module_map[mid]), "from": pos, "to": pos}}


def _span_from_cbor(d, hash_to_idx):
    if not isinstance(d, dict) or "Source" not in d:
        return None
    s = d["Source"]
    idx = hash_to_idx.get(s["module"])
    if idx is None:
        return None
    return (idx, s["from"]["line"], s["from"]["col"])


def _lin_to_cbor(lin: LinComb, field):
    return {
        "span": None,
        "value": [[{"id": var}, _field_bytes(c % field.P, field)] for var, c in lin.terms],
    }


def _quad_to_cbor(q: QuadComb, field):
    return {"span": None, "left": _lin_to_cbor(q.left, field), "right": _lin_to_cbor(q.right, field)}


def _solver_to_cbor(s: Solver):
    if s.name == "Bits":
        return {"Bits": s.arg}
    if s.name == "Ref":
        return {"Ref": {"index": s.arg, "signature": [0, 0]}}
    if s.name == "SnarkVerifyBls12377":
        return {"SnarkVerifyBls12377": s.arg}
    if s.name == "Zir":
        from ..lang.ast_codec import encode as ast_encode

        spec = getattr(s.arg, "spec", None)
        if spec is None:
            raise SerializationError("Zir solver is not serializable (no spec)")
        # CBOR-encoded expression AST + types (the reference CBOR-encodes a
        # ZIR function here, solver_indexer.rs; round 1 pickled — unsafe and
        # self-interop-only)
        return {"Zir": ast_encode(spec)}
    return s.name


def _stmt_to_cbor(s, field, module_map=None):
    if isinstance(s, Constraint):
        return {
            "Constraint": {
                "span": _span_to_cbor(s.span, module_map),
                "quad": _quad_to_cbor(s.quad, field),
                "lin": _lin_to_cbor(s.lin, field),
                "error": None if s.error is None else {"SourceAssertion": {"metadata": {"file": str(s.error), "position": None}}},
            }
        }
    if isinstance(s, Directive):
        return {
            "Directive": {
                "span": _span_to_cbor(s.span, module_map),
                "inputs": [_quad_to_cbor(q, field) for q in s.inputs],
                "outputs": [{"id": v} for v in s.outputs],
                "solver": _solver_to_cbor(s.solver),
            }
        }
    if isinstance(s, LogStatement):
        return {
            "Log": {
                "span": _span_to_cbor(s.span, module_map),
                "format_string": {"parts": s.format_string.split("{}")},
                "expressions": [
                    [ty, [_lin_to_cbor(l, field) for l in lins]] for ty, lins in s.expressions
                ],
            }
        }
    raise SerializationError(f"cannot serialize {type(s).__name__}")


class _UnconstrainedDetector:
    """ir/check.rs: directive outputs must later appear in a constraint."""

    def __init__(self):
        self.unconstrained = set()

    def visit(self, s):
        if isinstance(s, Directive):
            self.unconstrained |= set(v for v in s.outputs)
        elif isinstance(s, Constraint):
            for v, _ in s.quad.left.terms + s.quad.right.terms + s.lin.terms:
                self.unconstrained.discard(v)

    def finalize(self):
        if self.unconstrained:
            raise SerializationError(
                f"Error: Found {len(self.unconstrained)} unconstrained variable(s)"
            )


def serialize(prog: Prog, check_unconstrained: bool = True) -> bytes:
    field = prog.field

    # index Zir solvers (solver dedup, ir/solver_indexer.rs)
    solver_table: List[Solver] = list(prog.solvers)
    statements = []
    detector = _UnconstrainedDetector()
    count = 0
    for s in prog.statements:
        if isinstance(s, Directive) and s.solver.name == "Zir":
            idx = len(solver_table)
            solver_table.append(s.solver)
            s = Directive(s.inputs, s.outputs, Solver("Ref", idx), span=s.span)
        if isinstance(s, Constraint):
            count += 1
        detector.visit(s)
        statements.append(s)
    if check_unconstrained:
        detector.finalize()

    params_blob = cbor.encode(
        [{"id": p.id, "private": p.private} for p in prog.arguments]
    )
    module_map = prog.module_map if isinstance(prog.module_map, list) else None
    constraints_buf = io.BytesIO()
    for s in statements:
        constraints_buf.write(cbor.encode(_stmt_to_cbor(s, field, module_map)))
    constraints_blob = constraints_buf.getvalue()
    solvers_blob = cbor.encode([_solver_to_cbor(s) for s in solver_table])
    modules_blob = cbor.encode(
        {"modules": {_module_hash(m): m for m in (module_map or [])}}
    )

    header_size = 4 + 4 + 4 + 4 + 4 + 4 * (4 + 8 + 8)
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(VERSION)
    out.write(field.id())
    out.write(count.to_bytes(4, "little"))
    out.write(prog.return_count.to_bytes(4, "little"))
    offset = header_size
    for sid, blob in (
        (1, params_blob),
        (2, constraints_blob),
        (3, solvers_blob),
        (4, modules_blob),
    ):
        out.write(sid.to_bytes(4, "little"))
        out.write(offset.to_bytes(8, "little"))
        out.write(len(blob).to_bytes(8, "little"))
        offset += len(blob)
    out.write(params_blob)
    out.write(constraints_blob)
    out.write(solvers_blob)
    out.write(modules_blob)
    return out.getvalue()


def _cbor_to_lin(d, field) -> LinComb:
    terms = []
    for var, coef in d["value"]:
        terms.append((var["id"], int.from_bytes(coef, "little")))
    return LinComb(terms)


def _cbor_to_quad(d, field) -> QuadComb:
    return QuadComb(_cbor_to_lin(d["left"], field), _cbor_to_lin(d["right"], field))


def _cbor_to_solver(d) -> Solver:
    if isinstance(d, str):
        return Solver(d)
    if isinstance(d, dict):
        (name, val), = d.items()
        if name == "Bits":
            return Solver("Bits", val)
        if name == "Ref":
            return Solver("Ref", val["index"])
        if name == "SnarkVerifyBls12377":
            return Solver("SnarkVerifyBls12377", val)
        if name == "Zir":
            from ..lang.ast_codec import decode as ast_decode
            from ..lang.evaluator import make_zir_solver

            if isinstance(val, (bytes, bytearray)):
                raise SerializationError(
                    "legacy pickled Zir solver encoding is no longer read; "
                    "recompile the program"
                )
            return Solver("Zir", make_zir_solver(ast_decode(val)))
        return Solver(name, val)
    raise SerializationError(f"bad solver {d!r}")


def deserialize(data: bytes) -> Prog:
    if data[0:4] != MAGIC:
        raise SerializationError("wrong magic: not a zokrates program file")
    if data[4:8] != VERSION:
        raise SerializationError(f"unsupported file version {list(data[4:8])}")
    cid = data[8:12]
    curve = None
    for name, F in FIELDS.items():
        if F.id() == cid:
            curve = name
            break
    if curve is None:
        raise SerializationError(f"unknown curve id {cid.hex()}")
    field = FIELDS[curve]
    return_count = int.from_bytes(data[16:20], "little")
    pos = 20
    sections = {}
    for _ in range(4):
        sid = int.from_bytes(data[pos : pos + 4], "little")
        off = int.from_bytes(data[pos + 4 : pos + 12], "little")
        length = int.from_bytes(data[pos + 12 : pos + 20], "little")
        sections[sid] = (off, length)
        pos += 20

    def blob(sid):
        off, length = sections[sid]
        return data[off : off + length]

    params = [
        Parameter(d["id"], d["private"]) for d in cbor.decode(blob(1))
    ]

    mods = cbor.decode(blob(4)).get("modules", {}) if sections.get(4, (0, 0))[1] else {}
    module_list = [mods[h] for h in sorted(mods)]
    hash_to_idx = {h: i for i, h in enumerate(sorted(mods))}

    statements = []
    for item in cbor.decode_stream(blob(2)):
        (kind, val), = item.items()
        span = _span_from_cbor(val.get("span"), hash_to_idx)
        if kind == "Constraint":
            err = val.get("error")
            if isinstance(err, dict) and "SourceAssertion" in err:
                err = err["SourceAssertion"]["metadata"].get("file")
            elif err is not None:
                err = str(err)
            statements.append(
                Constraint(
                    _cbor_to_quad(val["quad"], field),
                    _cbor_to_lin(val["lin"], field),
                    err,
                    span=span,
                )
            )
        elif kind == "Directive":
            statements.append(
                Directive(
                    [_cbor_to_quad(q, field) for q in val["inputs"]],
                    [o["id"] for o in val["outputs"]],
                    _cbor_to_solver(val["solver"]),
                    span=span,
                )
            )
        elif kind == "Log":
            parts = val["format_string"]["parts"]
            exprs = [
                (ty, [_cbor_to_lin(l, field) for l in lins])
                for ty, lins in val["expressions"]
            ]
            statements.append(LogStatement("{}".join(parts), exprs, span=span))
        else:
            raise SerializationError(f"unknown statement kind {kind}")
    solvers = [_cbor_to_solver(s) for s in cbor.decode(blob(3))]
    return Prog(
        curve=curve,
        arguments=params,
        return_count=return_count,
        statements=statements,
        solvers=solvers,
        module_map=module_list,
    )
