"""Reference examples sweep (zokrates_cli/src/bin.rs:121-270).

Three tiers over the vendored tests/examples tree (.zok programs are
ground-truth content, same policy as the stdlib/corpus):
  * every file compiles on bn128 — except under compile_errors/, which
    must FAIL to compile,
  * top-level test*.zok also execute with a single zero input,
  * runtime_errors/* compile but fail at witness generation.
"""

from pathlib import Path

import pytest

EXAMPLES = Path(__file__).parent / "examples"


def _all_zok():
    for p in sorted(EXAMPLES.rglob("*.zok")):
        yield pytest.param(p, id=p.relative_to(EXAMPLES).as_posix()[:-4])


def _compile(path: Path):
    from zokrates_tpu.lang.compile import compile_file

    return compile_file(str(path), curve="bn128")


@pytest.mark.parametrize("path", list(_all_zok()))
def test_compile_example(path):
    from zokrates_tpu.lang.evaluator import CompileError
    from zokrates_tpu.lang.flatten import FlattenError
    from zokrates_tpu.lang.parser import ParseError

    should_error = "compile_errors" in path.parts
    try:
        _compile(path)
        ok = True
    except (CompileError, FlattenError, ParseError):
        ok = False
    assert ok != should_error, (
        f"{path}: expected {'error' if should_error else 'success'}"
    )


@pytest.mark.parametrize(
    "path",
    [pytest.param(p, id=p.stem) for p in sorted(EXAMPLES.glob("test*.zok"))],
)
def test_execute_example_ok(path):
    from zokrates_tpu.interp.interpreter import Interpreter

    prog = _compile(path).prog
    Interpreter().execute(prog, [0] * len(prog.arguments))


@pytest.mark.parametrize(
    "path",
    [
        pytest.param(p, id=p.stem)
        for p in sorted((EXAMPLES / "runtime_errors").glob("*.zok"))
    ],
)
def test_execute_example_err(path):
    from zokrates_tpu.interp.interpreter import ExecutionError, Interpreter

    prog = _compile(path).prog
    with pytest.raises(ExecutionError):
        Interpreter().execute(prog, [0] * len(prog.arguments))
