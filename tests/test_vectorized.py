"""Vectorized witness generator vs the scalar interpreter (bit-identical).

Covers every device solver kernel (Bits, ConditionEq, Div, Xor/Or/Sha
logic, EuclideanDiv) through compiled .zok programs, plus the sha256
round stdlib circuit, and the error paths (failed assertion parity).
"""

import io
from pathlib import Path

import pytest

from zokrates_tpu.interp.interpreter import Interpreter, UnsatisfiedConstraint
from zokrates_tpu.interp.vectorized import VectorizedInterpreter, build_plan
from zokrates_tpu.lang.compile import compile_source

STDLIB = Path(__file__).parent.parent / "zokrates_tpu" / "stdlib"


def _compile(src: str, curve: str = "bn128"):
    return compile_source(src, curve=curve).prog


def _both(prog, inputs):
    ws = Interpreter().execute(prog, inputs)
    wv = VectorizedInterpreter().execute(prog, inputs)
    assert ws.values == wv.values
    return ws


def test_field_arith_and_div():
    prog = _compile(
        "def main(private field a, field b) -> field {\n"
        "    field c = a * a + b;\n"
        "    field d = c / (a + 1);\n"
        "    return d * d;\n"
        "}\n"
    )
    _both(prog, [7, 5])


def test_bits_and_comparison():
    prog = _compile(
        "def main(field a, field b) -> bool {\n"
        "    return a < b;\n"
        "}\n"
    )
    _both(prog, [3, 9])
    _both(prog, [9, 3])


def test_condition_eq():
    prog = _compile(
        "def main(field a) -> bool {\n"
        "    return a == 42;\n"
        "}\n"
    )
    _both(prog, [42])
    _both(prog, [41])


def test_uint_ops_euclidean_div():
    prog = _compile(
        "def main(u32 a, u32 b) -> u32[3] {\n"
        "    u32 q = a / b;\n"
        "    u32 r = a % b;\n"
        "    u32 x = a ^ (b | (a & b));\n"
        "    return [q, r, x];\n"
        "}\n"
    )
    _both(prog, [1000003, 97])
    _both(prog, [0xFFFFFFFF, 1])


def test_sha256round_circuit():
    src = (
        'import "hashes/sha256/512bitPadded" as sha256;\n'
        "def main(u32[8] a, u32[8] b) -> u32[8] {\n"
        "    return sha256(a, b);\n"
        "}\n"
    )
    from zokrates_tpu.lang.compile import compile_source as cs

    prog = cs(src, curve="bn128").prog
    inputs = list(range(1, 17))
    _both(prog, inputs)


def test_failed_assertion_parity():
    prog = _compile(
        "def main(field a) {\n"
        "    assert(a == 1);\n"
        "    return;\n"
        "}\n"
    )
    with pytest.raises(UnsatisfiedConstraint) as e1:
        Interpreter().execute(prog, [2])
    with pytest.raises(UnsatisfiedConstraint) as e2:
        VectorizedInterpreter().execute(prog, [2])
    assert str(e1.value) == str(e2.value)


def test_logs_identical():
    prog = compile_source(
        "def main(field a) -> field {\n"
        '    log("a is {}", a);\n'
        "    return a + 1;\n"
        "}\n",
        curve="bn128",
        debug=True,
    ).prog
    s1, s2 = io.StringIO(), io.StringIO()
    Interpreter().execute(prog, [5], log_stream=s1)
    VectorizedInterpreter().execute(prog, [5], log_stream=s2)
    assert s1.getvalue() == s2.getvalue()


def test_plan_levels_sane():
    prog = _compile(
        "def main(field a, field b) -> field {\n"
        "    field c = a * b;\n"
        "    field d = c * c;\n"
        "    return d * a;\n"
        "}\n"
    )
    plan = build_plan(prog)
    assert plan.num_dense == len(
        set(v for v in plan.dense_of_var)
    )
    assert sum(len(s) for s in plan.segments) >= 1
