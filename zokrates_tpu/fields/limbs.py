"""Host <-> device limb conversions.

Device representation: a field element is a vector of NL base-2^16 limbs
stored least-significant-first in a uint32 array (trailing axis). Products of
two 16-bit limbs fit a uint32 exactly, and lazy column accumulation over up
to ~2^9 terms stays below 2^32, which is what makes the Montgomery loop in
`jfield.py` carry-free until the final normalization.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def n_limbs(p: int) -> int:
    return -(-p.bit_length() // LIMB_BITS)


def int_to_limbs(x: int, nl: int) -> np.ndarray:
    """One integer -> (nl,) uint32 limb vector (LSB first)."""
    out = np.empty(nl, dtype=np.uint32)
    for i in range(nl):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def ints_to_limbs(xs: Sequence[int], nl: int) -> np.ndarray:
    """Batch of integers -> (N, nl) uint32 array.

    Single-pass: each int serializes once via to_bytes (C speed), the
    byte->limb split is one vectorized numpy view. ~20x faster than a
    per-limb Python loop at 2^20 elements.
    """
    nbytes = 2 * nl  # LIMB_BITS == 16
    buf = b"".join([int(x).to_bytes(nbytes, "little") for x in xs])
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(xs), nl)
    return u16.astype(np.uint32)


def limbs_to_int(limbs) -> int:
    """(nl,) limb vector -> integer."""
    arr = np.asarray(limbs, dtype=np.uint64)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(arr))


def limbs_to_ints(limbs) -> List[int]:
    """(N, nl) limb array -> list of integers (single buffer pass)."""
    arr = np.ascontiguousarray(np.asarray(limbs), dtype=np.uint32).astype("<u2")
    nbytes = arr.shape[1] * 2
    buf = arr.tobytes()
    return [
        int.from_bytes(buf[j * nbytes : (j + 1) * nbytes], "little")
        for j in range(arr.shape[0])
    ]
