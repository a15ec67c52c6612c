"""Compilation driver: source -> (Prog, ABI).

API mirror of zokrates_core::compile::compile (compile.rs:171-214): takes a
source string + location + resolver, returns CompilationArtifacts {prog, abi}.
The resolver maps import strings to (canonical id, source): relative paths
resolve against the importing file's directory, bare paths against the
stdlib root (zokrates_fs_resolver/src/lib.rs:21-56).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

from ..fields.field import FIELDS
from ..ir.optimizer import optimize
from ..ir.program import Prog
from .evaluator import CompileError, Evaluator

STDLIB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "stdlib")


@dataclass
class CompilationArtifacts:
    prog: Prog
    abi: dict


def fs_resolver(stdlib_dir: str = None) -> Callable:
    stdlib = stdlib_dir or os.environ.get("ZOKRATES_STDLIB", STDLIB_DIR)

    def resolve(path: str, importing: Optional[str]) -> Tuple[str, str]:
        candidates = []
        if path.startswith("./") or path.startswith("../"):
            base = os.path.dirname(importing) if importing else "."
            candidates.append(os.path.normpath(os.path.join(base, path)))
        else:
            candidates.append(os.path.normpath(os.path.join(stdlib, path)))
        out = []
        for c in candidates:
            for full in (c, c + ".zok"):
                if os.path.isfile(full):
                    with open(full) as f:
                        return full, f.read()
            out.append(c)
        raise CompileError(f"could not resolve import {path} (tried {out})")

    return resolve


def source_resolver(sources: dict, stdlib_dir: str = None):
    """Resolver over an in-memory {path: source} map, stdlib-backed."""
    fsr = fs_resolver(stdlib_dir)

    def resolve(path: str, importing: Optional[str]):
        norm = path[2:] if path.startswith("./") else path
        for cand in (norm, norm + ".zok", path, path + ".zok"):
            if cand in sources:
                return cand, sources[cand]
        return fsr(path, importing)

    return resolve


def compile_source(
    source: str,
    curve: str = "bn128",
    path: str = "<main>",
    resolver: Optional[Callable] = None,
    debug: bool = False,
) -> CompilationArtifacts:
    resolver = resolver or source_resolver({path: source})
    if path not in getattr(resolver, "_extra", {}):
        base = resolver

        def wrapped(p, importing=None):
            if p == path:
                return path, source
            return base(p, importing)

        resolver_fn = wrapped
    else:
        resolver_fn = resolver
    ev = Evaluator(FIELDS[curve], resolver_fn, curve)
    # LogIgnorer semantics (reference zokrates_analysis/src/lib.rs:134-142):
    # log statements are stripped unless compiled with --debug
    ev.log_enabled = debug
    prog = optimize(ev.compile_main(path))
    return CompilationArtifacts(prog=prog, abi=ev.abi)


def compile_file(
    path: str, curve: str = "bn128", stdlib_dir: str = None, debug: bool = False
) -> CompilationArtifacts:
    with open(path) as f:
        source = f.read()
    ev = Evaluator(FIELDS[curve], fs_resolver(stdlib_dir), curve)
    ev.log_enabled = debug  # LogIgnorer: logs stripped unless --debug
    prog = optimize(ev.compile_main(os.path.abspath(path)))
    return CompilationArtifacts(prog=prog, abi=ev.abi)
