"""ctypes loader for the native host field/EC kernel (zkt_native.c).

Compiled on first use with the system C compiler into the user cache dir
(keyed by source hash), loaded with ctypes. Everything crosses the
boundary as little-endian u64 limb buffers (ints via int.to_bytes) or as
the MSM kernel's u32 16-bit-limb numpy rows — no pybind11 dependency.

Set ZOKRATES_TPU_NATIVE=0 to force the pure-Python fallbacks everywhere
(`available()` returns False); tests use this to cross-check both paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "zkt_native.c")
_LIB = None
_TRIED = False

MAXL = 12


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.environ.get(
        "ZOKRATES_TPU_NATIVE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "zokrates_tpu",
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, f"zkt_native-{tag}.so")
    if os.path.exists(so):
        return so
    cc = os.environ.get("CC", "gcc")
    # build to a temp name then rename: atomic under concurrent imports
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=cache_dir)
    os.close(fd)
    try:
        subprocess.run(
            [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so)
        return so
    except (subprocess.CalledProcessError, OSError) as e:
        if os.path.exists(tmp):
            os.unlink(tmp)
        print(f"zkt_native build failed ({e}); using Python fallback", file=sys.stderr)
        return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("ZOKRATES_TPU_NATIVE", "1") == "0":
        return None
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.zkt_ctx_size.restype = ctypes.c_int
    lib.zkt_ctx_init.restype = ctypes.c_int
    lib.zkt_g1_to_affine.restype = ctypes.c_int
    lib.zkt_g2_to_affine.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


_CTX_CACHE = {}


def _u64buf(n: int):
    return (ctypes.c_uint64 * n)()


def _int_to_u64(x: int, nl: int):
    return (ctypes.c_uint64 * nl).from_buffer_copy(x.to_bytes(nl * 8, "little"))


def _u64_to_int(buf, off: int, nl: int) -> int:
    return int.from_bytes(bytes(memoryview(buf))[off * 8 : (off + nl) * 8], "little")


class NativeField:
    """One prime field context; G1 ops over Fq, G2 over Fq2 (set beta)."""

    def __init__(self, p: int, beta: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native backend unavailable")
        self.lib = lib
        self.p = p
        self.nl = -(-p.bit_length() // 64)
        # device 16-bit limb count must give the same Montgomery R
        self.nl16 = 4 * self.nl
        self.ctx = ctypes.create_string_buffer(lib.zkt_ctx_size())
        rc = lib.zkt_ctx_init(self.ctx, _int_to_u64(p, self.nl), self.nl)
        if rc != 0:
            raise ValueError(f"zkt_ctx_init failed for p={p:#x}")
        self.beta = beta
        if beta is not None:
            lib.zkt_ctx_set_beta(self.ctx, _int_to_u64(beta % p, self.nl))

    # -- window combines (device Montgomery u32 rows in) ------------------

    def _rows(self, arr: np.ndarray, width: int) -> np.ndarray:
        a = np.ascontiguousarray(np.asarray(arr), dtype=np.uint32)
        if a.shape[1] < width:  # pad packed rows short of 4*nl (e.g. nl16=16)
            a = np.pad(a, ((0, 0), (0, width - a.shape[1])))
        elif a.shape[1] > width:
            a = np.ascontiguousarray(a[:, :width])
        return a

    def combine_windows(self, wX, wY, wZ, W: int, c: int) -> Tuple[int, int, int]:
        width = self.nl16
        ax, ay, az = (self._rows(a, width) for a in (wX, wY, wZ))
        out = _u64buf(3 * self.nl)
        self.lib.zkt_combine_windows(
            self.ctx,
            ax.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ay.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            az.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            W,
            width,
            c,
            out,
        )
        nl = self.nl
        return (
            _u64_to_int(out, 0, nl),
            _u64_to_int(out, nl, nl),
            _u64_to_int(out, 2 * nl, nl),
        )

    def combine_windows2(self, wX, wY, wZ, W: int, c: int):
        width = 2 * self.nl16
        ax, ay, az = (self._rows(a, width) for a in (wX, wY, wZ))
        out = _u64buf(6 * self.nl)
        self.lib.zkt_combine_windows2(
            self.ctx,
            ax.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ay.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            az.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            W,
            self.nl16,
            c,
            out,
        )
        nl = self.nl
        v = [_u64_to_int(out, i * nl, nl) for i in range(6)]
        return ((v[0], v[1]), (v[2], v[3]), (v[4], v[5]))

    # -- Jacobian point ops (canonical int coords) -------------------------

    def _jac_in(self, jac) -> object:
        nl = self.nl
        buf = _u64buf(3 * nl)
        data = b"".join(int(v % self.p).to_bytes(nl * 8, "little") for v in jac)
        ctypes.memmove(buf, data, len(data))
        return buf

    def _jac_out(self, buf):
        nl = self.nl
        return (
            _u64_to_int(buf, 0, nl),
            _u64_to_int(buf, nl, nl),
            _u64_to_int(buf, 2 * nl, nl),
        )

    def g1_mul(self, jac, k: int):
        """Jacobian (X, Y, Z) ints x scalar -> Jacobian ints."""
        k = int(k)
        if k < 0:
            raise ValueError("scalar must be non-negative")
        kl = max(1, -(-k.bit_length() // 64))
        out = _u64buf(3 * self.nl)
        self.lib.zkt_g1_mul(self.ctx, self._jac_in(jac), _int_to_u64(k, kl), kl, out)
        return self._jac_out(out)

    def g1_add(self, a, b):
        out = _u64buf(3 * self.nl)
        self.lib.zkt_g1_add(self.ctx, self._jac_in(a), self._jac_in(b), out)
        return self._jac_out(out)

    def g1_to_affine(self, jac):
        out = _u64buf(2 * self.nl)
        if not self.lib.zkt_g1_to_affine(self.ctx, self._jac_in(jac), out):
            return None
        return (_u64_to_int(out, 0, self.nl), _u64_to_int(out, self.nl, self.nl))

    def g1_shift(self, jac, k: int):
        """2^k * P (k successive doublings)."""
        out = _u64buf(3 * self.nl)
        self.lib.zkt_g1_shift(self.ctx, self._jac_in(jac), int(k), out)
        return self._jac_out(out)

    def sparse_window_g1(self, rows: np.ndarray, idx, digits, signs):
        """sum |d_i| * P_{idx_i} over packed Montgomery rows [x|y|-y|pad]
        (the MSM kernel layout); signs select the negated-y columns.
        Returns canonical Jacobian ints."""
        rows = np.ascontiguousarray(rows, dtype=np.uint32)
        idx = np.ascontiguousarray(idx, dtype=np.int32)
        digits = np.ascontiguousarray(digits, dtype=np.uint32)
        signs = np.ascontiguousarray(signs, dtype=np.uint32)
        out = _u64buf(3 * self.nl)
        self.lib.zkt_sparse_window_g1(
            self.ctx,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            rows.shape[1],
            self.nl16,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            digits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            signs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(idx),
            out,
        )
        return self._jac_out(out)

    # -- G2 (Fq2 coords as (c0, c1) int pairs) -----------------------------

    def _jac2_in(self, jac):
        nl = self.nl
        buf = _u64buf(6 * nl)
        parts = []
        for coord in jac:
            parts.append(int(coord[0] % self.p).to_bytes(nl * 8, "little"))
            parts.append(int(coord[1] % self.p).to_bytes(nl * 8, "little"))
        data = b"".join(parts)
        ctypes.memmove(buf, data, len(data))
        return buf

    def _jac2_out(self, buf):
        nl = self.nl
        v = [_u64_to_int(buf, i * nl, nl) for i in range(6)]
        return ((v[0], v[1]), (v[2], v[3]), (v[4], v[5]))

    def g2_mul(self, jac, k: int):
        k = int(k)
        if k < 0:
            raise ValueError("scalar must be non-negative")
        kl = max(1, -(-k.bit_length() // 64))
        out = _u64buf(6 * self.nl)
        self.lib.zkt_g2_mul(self.ctx, self._jac2_in(jac), _int_to_u64(k, kl), kl, out)
        return self._jac2_out(out)

    def g2_add(self, a, b):
        out = _u64buf(6 * self.nl)
        self.lib.zkt_g2_add(self.ctx, self._jac2_in(a), self._jac2_in(b), out)
        return self._jac2_out(out)

    def g2_to_affine(self, jac):
        out = _u64buf(4 * self.nl)
        if not self.lib.zkt_g2_to_affine(self.ctx, self._jac2_in(jac), out):
            return None
        nl = self.nl
        v = [_u64_to_int(out, i * nl, nl) for i in range(4)]
        return ((v[0], v[1]), (v[2], v[3]))

    def g2_shift(self, jac, k: int):
        out = _u64buf(6 * self.nl)
        self.lib.zkt_g2_shift(self.ctx, self._jac2_in(jac), int(k), out)
        return self._jac2_out(out)

    def sparse_window_g2(self, rows: np.ndarray, idx, digits, signs):
        """G2 variant over rows [x.c0|x.c1|y.c0|y.c1|-y.c0|-y.c1|pad]."""
        rows = np.ascontiguousarray(rows, dtype=np.uint32)
        idx = np.ascontiguousarray(idx, dtype=np.int32)
        digits = np.ascontiguousarray(digits, dtype=np.uint32)
        signs = np.ascontiguousarray(signs, dtype=np.uint32)
        out = _u64buf(6 * self.nl)
        self.lib.zkt_sparse_window_g2(
            self.ctx,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            rows.shape[1],
            self.nl16,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            digits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            signs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(idx),
            out,
        )
        return self._jac2_out(out)


def field_for(p: int, beta: Optional[int] = None) -> Optional[NativeField]:
    """Cached context, or None when the native backend is unavailable or
    the modulus/limb layout doesn't fit it (device 16-bit limb count must
    equal 4x the 64-bit count so the Montgomery R matches)."""
    if not available():
        return None
    if beta is not None:
        beta = beta % p  # callers pass small negative representatives
    key = (p, beta)
    ctx = _CTX_CACHE.get(key)
    if ctx is None and key not in _CTX_CACHE:
        nl16_dev = -(-p.bit_length() // 16)
        if nl16_dev != 4 * (-(-p.bit_length() // 64)) or p.bit_length() > 64 * MAXL:
            ctx = None
        else:
            try:
                ctx = NativeField(p, beta)
            except (RuntimeError, ValueError):
                ctx = None
        _CTX_CACHE[key] = ctx
    return _CTX_CACHE.get(key)
