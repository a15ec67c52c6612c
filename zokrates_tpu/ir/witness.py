"""Witness container + serialization (reference zokrates_ast/src/ir/witness.rs).

Binary format: usize LE length, then (variable id as i64 LE, value as field
LE bytes) pairs in BTreeMap (sorted-by-variable) order. JSON format maps
variable display names to decimal strings.
"""

from __future__ import annotations

import io
import json
from typing import Dict, List

from .program import var_name, var_public


class Witness:
    def __init__(self, values: Dict[int, int] = None):
        self.values: Dict[int, int] = dict(values) if values else {}
        self._arr_vars = None  # numpy sidecar (see read); vars, LE-sorted
        self._arr_vals = None

    def __getitem__(self, v: int) -> int:
        return self.values[v]

    def __setitem__(self, v: int, val: int):
        self.values[v] = val
        self._arr_vars = None  # mutation invalidates the sidecar
        self._arr_vals = None

    def __contains__(self, v):
        return v in self.values

    def __eq__(self, o):
        return isinstance(o, Witness) and self.values == o.values

    def __len__(self):
        return len(self.values)

    def return_values(self) -> List[int]:
        out = {k: v for k, v in self.values.items() if k < 0}
        return [out[var_public(i)] for i in range(len(out))]

    def format_outputs(self) -> str:
        items = [
            (k, v) for k, v in sorted(self.values.items()) if k < 0
        ]
        return "\n".join(f"{var_name(k)} {v}" for k, v in items)

    # -- binary ------------------------------------------------------------
    def write(self, w: io.RawIOBase, field) -> None:
        items = sorted(self.values.items())
        w.write(len(items).to_bytes(8, "little"))
        for var, val in items:
            w.write(var.to_bytes(8, "little", signed=True))
            w.write(field(val).to_byte_vector())

    @staticmethod
    def read(r: io.RawIOBase, field) -> "Witness":
        length = int.from_bytes(r.read(8), "little")
        stride = 8 + field.NBYTES
        buf = r.read(length * stride)
        values = {}
        for i in range(length):
            off = i * stride
            var = int.from_bytes(buf[off : off + 8], "little", signed=True)
            values[var] = int(
                field.from_byte_vector(buf[off + 8 : off + stride])
            )
        w = Witness(values)
        # numpy sidecar: (vars, raw value bytes) for the vectorized limb
        # fast path in the prover (groth16._witness_limbs) — the format is
        # fixed-stride, so this is two buffer views, not a parse
        try:
            import numpy as _np

            raw = _np.frombuffer(buf, dtype=_np.uint8).reshape(length, stride)
            w._arr_vars = raw[:, :8].copy().view("<i8").reshape(length)
            w._arr_vals = raw[:, 8:].copy()
        except ValueError:
            pass
        return w

    # -- json --------------------------------------------------------------
    def to_json(self) -> str:
        items = sorted(self.values.items())
        return json.dumps({var_name(k): str(v) for k, v in items}, indent=2)

    @staticmethod
    def from_json(s: str) -> "Witness":
        def parse_var(name: str) -> int:
            if name == "~one":
                return 0
            if name.startswith("~out_"):
                return -int(name[5:]) - 1
            return int(name[1:]) + 1

        return Witness({parse_var(k): int(v) for k, v in json.loads(s).items()})

    def __repr__(self):
        return "\n".join(
            f"{var_name(k)} {v}" for k, v in sorted(self.values.items())
        )
