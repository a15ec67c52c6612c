"""Compliance harness over the vendored JSON corpus (266 cases).

Mirrors zokrates_test/src/lib.rs:81-205: per JSON file — compile the .zok
entry point for each listed curve, assert the constraint budget, then for
each test vector ABI-encode inputs, interpret, ABI-decode outputs, and
compare against the expected Ok/Err.

Failures are the compiler's TODO list; the pass-rate gate below ratchets up
as coverage grows (current known-gap areas are tracked in corpus_skip.txt).
"""

import json
import os
from pathlib import Path

import pytest

CORPUS = Path(__file__).parent / "corpus"
SKIP_FILE = Path(__file__).parent / "corpus_skip.txt"

CURVE_MAP = {
    "Bn128": "bn128",
    "Bls12_381": "bls12_381",
    "Bls12_377": "bls12_377",
    "Bw6_761": "bw6_761",
}


def _cases():
    for root in ("core", "stdlib"):
        base = CORPUS / root
        for p in sorted(base.rglob("*.json")):
            yield pytest.param(p, id=f"{root}/{p.relative_to(base).as_posix()[:-5]}")


def _skips():
    if SKIP_FILE.exists():
        return {
            line.split("#")[0].strip()
            for line in SKIP_FILE.read_text().splitlines()
            if line.split("#")[0].strip()
        }
    return set()


SKIPS = _skips()


def run_case(json_path: Path, max_curves: int = None):
    from zokrates_tpu.abi import decode_value, encode_value
    from zokrates_tpu.interp.interpreter import (
        ExecutionError,
        Interpreter,
        UnsatisfiedConstraint,
        WrongInputCount,
    )
    from zokrates_tpu.lang.compile import compile_file
    from zokrates_tpu.lang.evaluator import CompileError
    from zokrates_tpu.lang.flatten import FlattenError
    from zokrates_tpu.lang.parser import ParseError

    spec = json.loads(json_path.read_text())
    # entry_point in the JSON is relative to the reference crate root:
    # "./tests/tests/..." points into the corpus, "./stdlib/..." into the
    # vendored standard library itself
    ep = spec.get("entry_point")
    zok = None
    if ep:
        if "/stdlib/" in ep and "tests/tests/" not in ep:
            import zokrates_tpu

            stdlib_root = Path(zokrates_tpu.__file__).parent / "stdlib"
            zok = stdlib_root / ep.split("/stdlib/", 1)[1]
        else:
            rel = ep.split("tests/tests/", 1)[-1]
            cand = json_path.parent / Path(rel).name
            if cand.exists():
                zok = cand
            else:
                base = json_path
                while base.name != "corpus":
                    base = base.parent
                for sub in ("core", "stdlib"):
                    c2 = base / sub / rel
                    if c2.exists():
                        zok = c2
                        break
    if zok is None:
        zok = json_path.with_suffix(".zok")
    assert zok.exists(), f"missing {zok}"

    curves = [CURVE_MAP[c] for c in spec.get("curves", ["Bn128"])][:max_curves]
    with_abi_default = spec.get("abi", True)

    for curve in curves:
        art = compile_file(str(zok), curve=curve)
        prog = art.prog

        budget = spec.get("max_constraint_count")
        count = prog.constraint_count()
        if budget is not None:
            assert count <= budget, (
                f"{zok.name} on {curve}: {count} constraints > budget {budget}"
            )

        p = prog.field.P
        for t in spec["tests"]:
            with_abi = t.get("abi", with_abi_default)
            values = t["input"]["values"]
            expected = t["output"]

            try:
                if with_abi:
                    ins = []
                    abi_ins = art.abi["inputs"]
                    if len(values) != len(abi_ins):
                        raise WrongInputCount(len(abi_ins), len(values))
                    for v, inp in zip(values, abi_ins):
                        ins += encode_value(v, inp["type"], p)
                else:
                    if len(values) != len(prog.arguments):
                        raise WrongInputCount(len(prog.arguments), len(values))
                    ins = [int(v) for v in values]
                witness = Interpreter().execute(prog, ins)
                rets = witness.return_values()
                if with_abi:
                    out_val = decode_value(rets, art.abi["output"])
                else:
                    out_val = [str(v) for v in rets]
                result = {"Ok": {"value": out_val}}
            except ExecutionError as e:
                if isinstance(e, UnsatisfiedConstraint):
                    result = {"Err": "UnsatisfiedConstraint"}
                elif isinstance(e, WrongInputCount):
                    result = {"Err": "WrongInputCount"}
                else:
                    result = {"Err": "Other"}

            if "Ok" in expected:
                assert "Ok" in result, f"{zok.name}{values}: expected Ok, got {result}"
                got = result["Ok"]["value"]
                want = expected["Ok"]["value"]
                assert got == want, f"{zok.name}{values}: {got} != {want}"
            else:
                assert "Err" in result, f"{zok.name}{values}: expected Err, got Ok {result}"
                want_kind = expected["Err"]
                if isinstance(want_kind, dict):
                    want_kind = next(iter(want_kind))
                if isinstance(result["Err"], str) and want_kind in (
                    "UnsatisfiedConstraint",
                    "WrongInputCount",
                ):
                    assert result["Err"] == want_kind, (
                        f"{zok.name}{values}: {result['Err']} != {want_kind}"
                    )


@pytest.mark.parametrize("json_path", list(_cases()))
def test_corpus_case(json_path):
    base = json_path
    while base.name != "corpus":
        base = base.parent
    rel = json_path.relative_to(base).as_posix()
    if rel in SKIPS:
        pytest.skip(f"known gap: {rel}")
    run_case(json_path)
