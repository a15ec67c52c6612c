"""`.out` binary round-trips: spans, module map, error metadata, Zir
solvers as CBOR AST (no pickle)."""

import os
import tempfile

from zokrates_tpu.interp.interpreter import Interpreter
from zokrates_tpu.ir.serialize import deserialize, serialize
from zokrates_tpu.lang.compile import compile_file, compile_source


def test_span_and_module_map_roundtrip():
    prog = compile_source(
        "def main(field a, field b) -> bool {\n"
        "    bool c = a < b;\n"
        "    assert(a != 0);\n"
        "    return c;\n"
        "}\n"
    ).prog
    blob = serialize(prog)
    p2 = deserialize(blob)
    assert p2.module_map == prog.module_map
    assert [s.span for s in p2.statements] == [s.span for s in prog.statements]


def test_error_metadata_roundtrip():
    prog = compile_source(
        'def main(field a) { assert(a == 1, "must be one"); return; }'
    ).prog
    p2 = deserialize(serialize(prog))
    errs = [s.error for s in p2.statements if getattr(s, "error", None)]
    assert any("must be one" in e for e in errs)


def test_zir_solver_cbor_roundtrip():
    src = (
        "def main(field x) -> field {\n"
        "    field mut inv = 0;\n"
        "    asm {\n"
        "        inv <-- x == 0 ? 0 : 1 / x;\n"
        "        inv * x === 1;\n"
        "    }\n"
        "    return inv;\n"
        "}\n"
    )
    d = tempfile.mkdtemp()
    path = os.path.join(d, "inv.zok")
    with open(path, "w") as f:
        f.write(src)
    prog = compile_file(path).prog
    blob = serialize(prog)
    p2 = deserialize(blob)
    w = Interpreter().execute(p2, [7])
    p = prog.field.P
    assert w.return_values()[0] == pow(7, -1, p)
