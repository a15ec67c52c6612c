"""CBOR-friendly codec for untyped AST / type trees.

The reference serializes ZIR functions (asm solver bodies) as CBOR inside
the `.out` solver section (zokrates_ast/src/ir/solver_indexer.rs); round 1
pickled them instead, which was both a self-interop-only format and an
arbitrary-code-execution hazard on load. This codec encodes the solver
spec (expression AST + concrete types + generic bindings) as plain
maps/lists so `.out` files are inert data.

Encoding: dataclasses become {"__c": ClassName, **fields}; tuples become
{"__t": [items]}; primitives pass through. Only whitelisted AST/type
classes decode — unknown tags raise."""

from __future__ import annotations

from dataclasses import fields, is_dataclass

from . import ast as A
from . import types as T

_CLASSES = {}
for _mod in (A, T):
    for _name in dir(_mod):
        _cls = getattr(_mod, _name)
        if isinstance(_cls, type) and is_dataclass(_cls):
            _CLASSES[_cls.__name__] = _cls


def encode(obj):
    if obj is None or isinstance(obj, (bool, int, str, bytes)):
        return obj
    if isinstance(obj, tuple):
        return {"__t": [encode(x) for x in obj]}
    if isinstance(obj, list):
        return [encode(x) for x in obj]
    if isinstance(obj, dict):
        return {"__d": [[encode(k), encode(v)] for k, v in obj.items()]}
    if is_dataclass(obj):
        d = {"__c": type(obj).__name__}
        for f in fields(obj):
            d[f.name] = encode(getattr(obj, f.name))
        return d
    raise TypeError(f"cannot encode {type(obj).__name__}")


def decode(obj):
    if obj is None or isinstance(obj, (bool, int, str, bytes)):
        return obj
    if isinstance(obj, list):
        return [decode(x) for x in obj]
    if isinstance(obj, dict):
        if "__t" in obj:
            return tuple(decode(x) for x in obj["__t"])
        if "__d" in obj:
            return {decode(k): decode(v) for k, v in obj["__d"]}
        if "__c" in obj:
            cls = _CLASSES.get(obj["__c"])
            if cls is None:
                raise ValueError(f"unknown AST class {obj['__c']!r}")
            kwargs = {k: decode(v) for k, v in obj.items() if k != "__c"}
            return cls(**kwargs)
        raise ValueError(f"undecodable map {list(obj)[:3]}")
    raise TypeError(f"cannot decode {type(obj).__name__}")
