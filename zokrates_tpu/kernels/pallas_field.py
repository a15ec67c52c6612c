"""Pallas TPU kernels for prime-field and EC arithmetic (limb-major layout).

Why this exists: the XLA path builds EC adds out of ~2k small HLO ops whose
per-op dispatch/loop overhead dominates on the axon backend (measured
~1.3ms per EC-add step regardless of batch width). Here the entire mixed
Jacobian addition — ~13 Montgomery multiplications plus the modular
add/sub chains — runs inside ONE Mosaic kernel over a (nl, B) block:
limbs on the sublane axis, points on the 128-wide lane axis, everything
unrolled (no While loops at all).

Layout contract: coordinates are (nl, N) uint32 — "limb-major", the
transpose of the jfield layout — so a block (nl, 256) tiles the VPU
exactly ((16, 256) = 2 x 2 native (8,128) tiles).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.jfield import field_spec
from ..fields.limbs import LIMB_BITS

_MASK = np.uint32((1 << LIMB_BITS) - 1)
_B16 = np.uint32(1 << LIMB_BITS)


def _row(x, i):
    return x[i : i + 1]  # keep 2-D (1, B)


class _F:
    """Field helpers over (nl, B) blocks, specialized per modulus.

    All methods are pure jnp and unrolled — usable inside a Pallas kernel.
    """

    def __init__(self, p: int, compact: bool = False):
        spec = field_spec(p)
        self.nl = spec.nl
        self.n0inv = np.uint32(spec.n0inv)
        self.p_rows = [np.uint32(v) for v in spec.p_limbs]  # python scalars
        self.r_rows = [np.uint32(v) for v in spec.r_limbs]
        # compact=True swaps the unrolled CIOS loop for a lax.scan: O(1)
        # trace size. Used by interpret-mode tests — the unrolled form
        # makes XLA:CPU compiles of a whole kernel take minutes.
        self.compact = compact

    # -- normalization ----------------------------------------------------
    def carry_sweep(self, rows):
        """rows: list of nl (1,B) uint32 columns (< 2^32) -> normalized
        rows + carry (1,B)."""
        if self.compact:
            def body(carry, r):
                s = r + carry
                return s >> LIMB_BITS, s & _MASK
            carry, out = jax.lax.scan(body, jnp.zeros_like(rows[0]), jnp.stack(rows))
            return [out[i] for i in range(self.nl)], carry
        out = []
        carry = jnp.zeros_like(rows[0])
        for r in rows:
            s = r + carry
            out.append(s & _MASK)
            carry = s >> LIMB_BITS
        return out, carry

    def cond_sub_p(self, rows, hi):
        """rows (< 2p with hi overflow bit) -> rows mod p."""
        if self.compact:
            def body(borrow, rp):
                r, pv = rp
                d = (r + _B16) - pv - borrow
                return jnp.where((d >> LIMB_BITS) == 0, np.uint32(1), np.uint32(0)), d & _MASK
            borrow, diff = jax.lax.scan(
                body, jnp.zeros_like(rows[0]), (jnp.stack(rows), self._p_stack)
            )
            use = jnp.logical_or(hi > 0, borrow == 0)
            return [jnp.where(use, diff[i], rows[i]) for i in range(self.nl)]
        diff = []
        borrow = jnp.zeros_like(rows[0])
        for i in range(self.nl):
            d = (rows[i] + _B16) - self.p_rows[i] - borrow
            diff.append(d & _MASK)
            borrow = jnp.where((d >> LIMB_BITS) == 0, np.uint32(1), np.uint32(0))
        use = jnp.logical_or(hi > 0, borrow == 0)
        return [jnp.where(use, d, r) for d, r in zip(diff, rows)]

    # -- ring ops ----------------------------------------------------------
    def add(self, a, b):
        rows = [x + y for x, y in zip(a, b)]
        rows, carry = self.carry_sweep(rows)
        return self.cond_sub_p(rows, carry)

    def neg(self, a):
        is_zero = a[0] == 0
        for r in a[1:]:
            is_zero = jnp.logical_and(is_zero, r == 0)
        if self.compact:
            def body(borrow, pr):
                pv, x = pr
                d = (pv + _B16) - x - borrow
                return jnp.where((d >> LIMB_BITS) == 0, np.uint32(1), np.uint32(0)), d & _MASK
            _, out = jax.lax.scan(
                body, jnp.zeros_like(a[0]), (self._p_stack, jnp.stack(a))
            )
            return [jnp.where(is_zero, a[i], out[i]) for i in range(self.nl)]
        out = []
        borrow = jnp.zeros_like(a[0])
        for i in range(self.nl):
            d = (jnp.full_like(a[i], self.p_rows[i]) + _B16) - a[i] - borrow
            out.append(d & _MASK)
            borrow = jnp.where((d >> LIMB_BITS) == 0, np.uint32(1), np.uint32(0))
        return [jnp.where(is_zero, x, o) for x, o in zip(a, out)]

    def sub(self, a, b):
        return self.add(a, self.neg(b))

    def mul(self, a, b):
        """Unrolled CIOS Montgomery product, vectorized over the limb axis:
        ~16 tensor instructions per word instead of ~64 row ops (kernel
        size directly bounds Mosaic compile time)."""
        nl = self.nl
        B = jnp.concatenate(b, axis=0)                  # (nl, *tail)
        p_col = self.p_col(None)
        zrow = jnp.zeros((1,) + self._tail, jnp.uint32)

        def step(t, ai):
            prod = ai * B                               # (nl, *tail)
            lo = jnp.concatenate([prod & _MASK, zrow], axis=0)
            hi = jnp.concatenate([zrow, prod >> LIMB_BITS], axis=0)
            t = t + lo + hi
            m = (t[0:1] * self.n0inv) & _MASK
            prod2 = m * p_col
            lo2 = jnp.concatenate([prod2 & _MASK, zrow], axis=0)
            hi2 = jnp.concatenate([zrow, prod2 >> LIMB_BITS], axis=0)
            t = t + lo2 + hi2
            carry = t[0:1] >> LIMB_BITS
            return jnp.concatenate([t[1:2] + carry, t[2:], zrow], axis=0)

        t = jnp.zeros((nl + 1,) + self._tail, jnp.uint32)
        if self.compact:
            A = jnp.concatenate(a, axis=0)              # (nl, *tail)
            t, _ = jax.lax.scan(
                lambda t, ai: (step(t, ai[None]), None), t, A
            )
        else:
            for i in range(nl):
                t = step(t, a[i])
        rows, carry = self.carry_sweep([t[i : i + 1] for i in range(nl)])
        return self.cond_sub_p(rows, carry + t[nl : nl + 1])

    def prep(self, lanes):
        """Build in-kernel constant tensors once per kernel body (Pallas
        kernels may not capture array constants; jnp.full from python
        scalars is allowed).

        `lanes` is an int (legacy 2D layout: rows are (1, lanes)) or a
        tuple (S, 128) (3D layout: rows are (1, S, 128), filling S VPU
        sublane groups per instruction — measured ~2-3x faster per lane
        than the underfilled (1, lanes) rows, exp/m12_3d.py)."""
        tail = (lanes,) if isinstance(lanes, int) else tuple(lanes)
        self._tail = tail
        self._p_col = jnp.concatenate(
            [jnp.full((1,) + tail, v, jnp.uint32) for v in self.p_rows], axis=0
        )
        if self.compact:
            # (nl, 1, *tail) stacked view for the lax.scan carry chains
            self._p_stack = jnp.stack(
                [jnp.full((1,) + tail, v, jnp.uint32) for v in self.p_rows]
            )

    def p_col(self, lanes):
        return self._p_col

    def select(self, cond, a, b):
        return [jnp.where(cond, x, y) for x, y in zip(a, b)]

    def is_zero(self, a):
        z = a[0] == 0
        for r in a[1:]:
            z = jnp.logical_and(z, r == 0)
        return z

    def one_mont(self, like):
        return [jnp.full_like(like, v) for v in self.r_rows]

    def zero(self, like):
        return [jnp.zeros_like(like) for _ in range(self.nl)]


class _F2:
    """Fq2 = Fq[u]/(u^2 - beta) helpers over lists of 2*nl rows.

    Element layout: [c0 limb rows..., c1 limb rows...]. Exposes the same
    row-list API as _F (nl / prep / mul / add / sub / neg / select /
    is_zero / zero / one_mont), so the generic Jacobian formulas
    (_mixed_add_inline, _general_add, _double_inline) and the whole
    walk/suffix kernel machinery in kernels/msm_sorted.py run unchanged
    over G2 — the TPU answer to arkworks' per-group Pippenger
    instantiations. beta must be a small negative integer (bn254 and
    bls12_381 use u^2 = -1, bls12_377 uses u^2 = -5), so the c0 term of
    the Karatsuba product is t0 - |beta|*t1 via an add chain — no extra
    Montgomery multiplication."""

    def __init__(self, p: int, beta: int, compact: bool = False):
        assert -16 <= beta < 0, f"nonresidue {beta} out of the small-int range"
        self.base = _F(p, compact=compact)
        self.nl = 2 * self.base.nl
        self.beta = beta
        self.compact = compact

    def _s(self, a):
        n = self.base.nl
        return a[:n], a[n:]

    def prep(self, lanes):
        self.base.prep(lanes)

    def _mul_small(self, x, k: int):
        """k*x for a small positive host int k, via a double-and-add chain."""
        F = self.base
        acc = None
        doubling = x
        while k:
            if k & 1:
                acc = doubling if acc is None else F.add(acc, doubling)
            k >>= 1
            if k:
                doubling = F.add(doubling, doubling)
        return acc

    def mul(self, a, b):
        F = self.base
        a0, a1 = self._s(a)
        b0, b1 = self._s(b)
        t0 = F.mul(a0, b0)
        t1 = F.mul(a1, b1)
        t2 = F.mul(F.add(a0, a1), F.add(b0, b1))
        c1 = F.sub(F.sub(t2, t0), t1)
        c0 = F.sub(t0, self._mul_small(t1, -self.beta))
        return c0 + c1

    def add(self, a, b):
        F = self.base
        a0, a1 = self._s(a)
        b0, b1 = self._s(b)
        return F.add(a0, b0) + F.add(a1, b1)

    def sub(self, a, b):
        F = self.base
        a0, a1 = self._s(a)
        b0, b1 = self._s(b)
        return F.sub(a0, b0) + F.sub(a1, b1)

    def neg(self, a):
        F = self.base
        a0, a1 = self._s(a)
        return F.neg(a0) + F.neg(a1)

    def select(self, cond, a, b):
        return [jnp.where(cond, x, y) for x, y in zip(a, b)]

    def is_zero(self, a):
        z = a[0] == 0
        for r in a[1:]:
            z = jnp.logical_and(z, r == 0)
        return z

    def one_mont(self, like):
        return self.base.one_mont(like) + self.base.zero(like)

    def zero(self, like):
        return [jnp.zeros_like(like) for _ in range(self.nl)]


def field_for(p: int, beta, compact: bool = False):
    """Row-list field helpers: base field (beta=None) or Fq2 (beta<0)."""
    return _F(p, compact=compact) if beta is None else _F2(p, beta, compact=compact)


def _split(ref, nl):
    """(nl, B) ref/array -> list of nl (B,)-shaped rows (kept 2D as (1,B))."""
    return [ref[i : i + 1] for i in range(nl)]


def _join(rows):
    return jnp.concatenate(rows, axis=0)


def mixed_add_kernel_factory(p: int):
    """Kernel: (X, Y, Z, Qx, Qy) blocks (nl, B) -> new (X, Y, Z).

    Complete mixed Jacobian addition (same formulas as kernels/jec.py,
    including the double / cancel / infinity edge cases)."""
    F = _F(p)
    nl = F.nl

    def kernel(x_ref, y_ref, z_ref, qx_ref, qy_ref, ox_ref, oy_ref, oz_ref):
        F.prep(x_ref.shape[1])
        X1 = _split(x_ref[:], nl)
        Y1 = _split(y_ref[:], nl)
        Z1 = _split(z_ref[:], nl)
        Qx = _split(qx_ref[:], nl)
        Qy = _split(qy_ref[:], nl)

        p_inf = F.is_zero(Z1)

        Z1Z1 = F.mul(Z1, Z1)
        U2 = F.mul(Qx, Z1Z1)
        S2 = F.mul(F.mul(Qy, Z1), Z1Z1)
        H = F.sub(U2, X1)
        R = F.sub(S2, Y1)

        same_x = F.is_zero(H)
        same_y = F.is_zero(R)
        is_double = jnp.logical_and(same_x, same_y)
        is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))

        H2 = F.add(H, H)
        I = F.mul(H2, H2)
        J = F.mul(H, I)
        R2 = F.add(R, R)
        V = F.mul(X1, I)
        R2sq = F.mul(R2, R2)
        X3 = F.sub(F.sub(R2sq, J), F.add(V, V))
        Y1J = F.mul(Y1, J)
        Y3 = F.sub(F.mul(R2, F.sub(V, X3)), F.add(Y1J, Y1J))
        Z3 = F.mul(F.add(Z1, Z1), H)

        # doubling branch (dbl-2009-l)
        A = F.mul(X1, X1)
        Bv = F.mul(Y1, Y1)
        C = F.mul(Bv, Bv)
        t = F.add(X1, Bv)
        D = F.sub(F.sub(F.mul(t, t), A), C)
        D = F.add(D, D)
        E = F.add(F.add(A, A), A)
        Fq = F.mul(E, E)
        dX = F.sub(Fq, F.add(D, D))
        C8 = F.add(C, C)
        C8 = F.add(C8, C8)
        C8 = F.add(C8, C8)
        dY = F.sub(F.mul(E, F.sub(D, dX)), C8)
        YZ = F.mul(Y1, Z1)
        dZ = F.add(YZ, YZ)

        X3 = F.select(is_double, dX, X3)
        Y3 = F.select(is_double, dY, Y3)
        Z3 = F.select(is_double, dZ, Z3)
        Z3 = F.select(is_cancel, F.zero(Z3[0]), Z3)
        one = F.one_mont(Z3[0])
        X3 = F.select(p_inf, Qx, X3)
        Y3 = F.select(p_inf, Qy, Y3)
        Z3 = F.select(p_inf, one, Z3)

        ox_ref[:] = _join(X3)
        oy_ref[:] = _join(Y3)
        oz_ref[:] = _join(Z3)

    return kernel


_KERNEL_CACHE = {}


def mixed_add_lm(p: int, X, Y, Z, Qx, Qy, block: int = 256, interpret: bool = False):
    """Mixed add over limb-major coords (nl, N); N must be a multiple of
    `block`. Returns new (X, Y, Z)."""
    nl = field_spec(p).nl
    N = X.shape[1]
    assert N % block == 0, f"N={N} not a multiple of block={block}"
    key = (p, N, block, interpret)
    if key not in _KERNEL_CACHE:
        kernel = mixed_add_kernel_factory(p)
        grid = (N // block,)
        spec = pl.BlockSpec((nl, block), lambda i: (0, i), memory_space=pltpu.VMEM)
        _KERNEL_CACHE[key] = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((nl, N), jnp.uint32)] * 3,
            grid=grid,
            in_specs=[spec] * 5,
            out_specs=[spec] * 3,
            interpret=interpret,
        )
    out = _KERNEL_CACHE[key](X, Y, Z, Qx, Qy)
    return tuple(out)


# ---------------------------------------------------------------------------
# Full bucket-accumulation kernel: the entire Pippenger inner loop for one
# window batch runs inside a single Mosaic kernel. Buckets live in VMEM
# scratch; the per-point bucket select/update uses one-hot masks over the
# (small) bucket count, which is why this kernel fixes c = 4 (16 buckets —
# bucket 0 unused/dropped, tables fit VMEM at block = 256 lanes).
# ---------------------------------------------------------------------------


def accumulate_kernel_factory(p: int, n_buckets: int, chunk_len: int):
    F = _F(p)
    nl = F.nl

    def kernel(d_ref, qx_ref, qy_ref, bx_ref, by_ref, bz_ref, scratch):
        F.prep(d_ref.shape[1])
        # scratch: (n_buckets, 3, nl, block) VMEM bucket tables
        # init: X=1,Y=1,Z=0 (Montgomery one for X/Y is irrelevant; Z=0 marks inf)
        one = jnp.concatenate(
            [jnp.full((1, d_ref.shape[1]), v, jnp.uint32) for v in F.r_rows], axis=0
        )
        for b in range(n_buckets):
            scratch[b, 0] = one
            scratch[b, 1] = one
            scratch[b, 2] = jnp.zeros_like(one)

        # unrolled time loop (chunk_len is small by construction)
        for t in range(chunk_len):
            d = d_ref[t : t + 1]          # (1, block)
            Qx = [qx_ref[t * nl + i : t * nl + i + 1] for i in range(nl)]
            Qy = [qy_ref[t * nl + i : t * nl + i + 1] for i in range(nl)]

            # gather current bucket value via one-hot select
            curX = [jnp.zeros_like(d) for _ in range(nl)]
            curY = [jnp.zeros_like(d) for _ in range(nl)]
            curZ = [jnp.zeros_like(d) for _ in range(nl)]
            for b in range(1, n_buckets):
                hit = d == np.uint32(b)
                bx = scratch[b, 0]
                by = scratch[b, 1]
                bz = scratch[b, 2]
                for i in range(nl):
                    curX[i] = jnp.where(hit, bx[i : i + 1], curX[i])
                    curY[i] = jnp.where(hit, by[i : i + 1], curY[i])
                    curZ[i] = jnp.where(hit, bz[i : i + 1], curZ[i])

            # mixed add cur + Q  (same formula set as mixed_add_kernel)
            X1, Y1, Z1 = curX, curY, curZ
            p_inf = F.is_zero(Z1)
            Z1Z1 = F.mul(Z1, Z1)
            U2 = F.mul(Qx, Z1Z1)
            S2 = F.mul(F.mul(Qy, Z1), Z1Z1)
            H = F.sub(U2, X1)
            R = F.sub(S2, Y1)
            same_x = F.is_zero(H)
            same_y = F.is_zero(R)
            is_double = jnp.logical_and(same_x, same_y)
            is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))
            H2 = F.add(H, H)
            I = F.mul(H2, H2)
            J = F.mul(H, I)
            R2 = F.add(R, R)
            V = F.mul(X1, I)
            R2sq = F.mul(R2, R2)
            X3 = F.sub(F.sub(R2sq, J), F.add(V, V))
            Y1J = F.mul(Y1, J)
            Y3 = F.sub(F.mul(R2, F.sub(V, X3)), F.add(Y1J, Y1J))
            Z3 = F.mul(F.add(Z1, Z1), H)
            A = F.mul(X1, X1)
            Bv = F.mul(Y1, Y1)
            C = F.mul(Bv, Bv)
            tt = F.add(X1, Bv)
            D = F.sub(F.sub(F.mul(tt, tt), A), C)
            D = F.add(D, D)
            E = F.add(F.add(A, A), A)
            Fq = F.mul(E, E)
            dX = F.sub(Fq, F.add(D, D))
            C8 = F.add(C, C)
            C8 = F.add(C8, C8)
            C8 = F.add(C8, C8)
            dY = F.sub(F.mul(E, F.sub(D, dX)), C8)
            YZ = F.mul(Y1, Z1)
            dZ = F.add(YZ, YZ)
            X3 = F.select(is_double, dX, X3)
            Y3 = F.select(is_double, dY, Y3)
            Z3 = F.select(is_double, dZ, Z3)
            Z3 = F.select(is_cancel, F.zero(Z3[0]), Z3)
            one_rows = F.one_mont(Z3[0])
            X3 = F.select(p_inf, Qx, X3)
            Y3 = F.select(p_inf, Qy, Y3)
            Z3 = F.select(p_inf, one_rows, Z3)

            nX = _join(X3)
            nY = _join(Y3)
            nZ = _join(Z3)
            # scatter back via one-hot
            for b in range(1, n_buckets):
                hit = d == np.uint32(b)
                scratch[b, 0] = jnp.where(hit, nX, scratch[b, 0])
                scratch[b, 1] = jnp.where(hit, nY, scratch[b, 1])
                scratch[b, 2] = jnp.where(hit, nZ, scratch[b, 2])

        for b in range(n_buckets):
            bx_ref[b] = scratch[b, 0]
            by_ref[b] = scratch[b, 1]
            bz_ref[b] = scratch[b, 2]

    return kernel


_ACC_CACHE = {}


def accumulate_lm(
    p: int,
    digits,   # (chunk_len, R) uint32
    Qx,       # (chunk_len * nl, R)  — limb rows stacked per step
    Qy,
    n_buckets: int = 16,
    block: int = 256,
    interpret: bool = False,
):
    """Bucket accumulation over limb-major points. Returns bucket tables
    (n_buckets, nl, R) per coordinate."""
    nl = field_spec(p).nl
    chunk_len, R = digits.shape
    assert R % block == 0
    key = (p, n_buckets, chunk_len, R, block, interpret)
    if key not in _ACC_CACHE:
        kernel = accumulate_kernel_factory(p, n_buckets, chunk_len)
        grid = (R // block,)
        d_spec = pl.BlockSpec((chunk_len, block), lambda i: (0, i), memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec(
            (chunk_len * nl, block), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (n_buckets, nl, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        _ACC_CACHE[key] = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((n_buckets, nl, R), jnp.uint32)] * 3,
            grid=grid,
            in_specs=[d_spec, q_spec, q_spec],
            out_specs=[out_spec] * 3,
            scratch_shapes=[pltpu.VMEM((n_buckets, 3, nl, block), jnp.uint32)],
            interpret=interpret,
        )
    return tuple(_ACC_CACHE[key](digits, Qx, Qy))


# ---------------------------------------------------------------------------
# Whole-MSM Pallas kernel. One pallas_call runs the entire Pippenger core:
#
#   grid = (T,) time steps; lanes = W windows x CH chunks (block columns);
#   scratch holds per-lane bucket tables (persisting across the sequential
#   TPU grid); the final grid step folds the chunk groups lane-wise and
#   performs the weighted suffix reduction over buckets with an in-kernel
#   fori loop. Output: per-window Jacobian sums — the only thing left for
#   the host is the ~W*c doubling combine (microseconds of bigint math).
# ---------------------------------------------------------------------------


def _general_add(F, P1, P2):
    """Complete Jacobian + Jacobian addition on limb rows."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    Z1Z1 = F.mul(Z1, Z1)
    Z2Z2 = F.mul(Z2, Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
    S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
    H = F.sub(U2, U1)
    R = F.sub(S2, S1)
    same_x = F.is_zero(H)
    same_y = F.is_zero(R)
    is_double = jnp.logical_and(same_x, same_y)
    is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))
    H2 = F.add(H, H)
    I = F.mul(H2, H2)
    J = F.mul(H, I)
    R2 = F.add(R, R)
    V = F.mul(U1, I)
    R2sq = F.mul(R2, R2)
    X3 = F.sub(F.sub(R2sq, J), F.add(V, V))
    S1J = F.mul(S1, J)
    Y3 = F.sub(F.mul(R2, F.sub(V, X3)), F.add(S1J, S1J))
    Zs = F.add(Z1, Z2)
    Z3 = F.mul(F.sub(F.sub(F.mul(Zs, Zs), Z1Z1), Z2Z2), H)
    # doubling of P1
    A = F.mul(X1, X1)
    Bv = F.mul(Y1, Y1)
    C = F.mul(Bv, Bv)
    tt = F.add(X1, Bv)
    D = F.sub(F.sub(F.mul(tt, tt), A), C)
    D = F.add(D, D)
    E = F.add(F.add(A, A), A)
    Fq = F.mul(E, E)
    dX = F.sub(Fq, F.add(D, D))
    C8 = F.add(C, C)
    C8 = F.add(C8, C8)
    C8 = F.add(C8, C8)
    dY = F.sub(F.mul(E, F.sub(D, dX)), C8)
    YZ = F.mul(Y1, Z1)
    dZ = F.add(YZ, YZ)
    X3 = F.select(is_double, dX, X3)
    Y3 = F.select(is_double, dY, Y3)
    Z3 = F.select(is_double, dZ, Z3)
    Z3 = F.select(is_cancel, F.zero(Z3[0]), Z3)
    X3 = F.select(q_inf, X1, F.select(p_inf, X2, X3))
    Y3 = F.select(q_inf, Y1, F.select(p_inf, Y2, Y3))
    Z3 = F.select(q_inf, Z1, F.select(p_inf, Z2, Z3))
    return X3, Y3, Z3


def _mixed_add_inline(F, cur, Qx, Qy, with_double: bool = True):
    """Mixed Jacobian+affine add. with_double=False skips the 7-mul doubling
    branch (the select condition is still computed and returned as a flag):
    when P1 == (Qx, Qy) the result is WRONG — callers must check the flag
    and fall back to the complete kernel. Saves ~40% of the Montgomery
    multiplications on the Pippenger hot path, where bucket == point
    collisions are vanishingly rare."""
    X1, Y1, Z1 = cur
    p_inf = F.is_zero(Z1)
    Z1Z1 = F.mul(Z1, Z1)
    U2 = F.mul(Qx, Z1Z1)
    S2 = F.mul(F.mul(Qy, Z1), Z1Z1)
    H = F.sub(U2, X1)
    R = F.sub(S2, Y1)
    same_x = F.is_zero(H)
    same_y = F.is_zero(R)
    is_double = jnp.logical_and(same_x, same_y)
    is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))
    H2 = F.add(H, H)
    I = F.mul(H2, H2)
    J = F.mul(H, I)
    R2 = F.add(R, R)
    V = F.mul(X1, I)
    R2sq = F.mul(R2, R2)
    X3 = F.sub(F.sub(R2sq, J), F.add(V, V))
    Y1J = F.mul(Y1, J)
    Y3 = F.sub(F.mul(R2, F.sub(V, X3)), F.add(Y1J, Y1J))
    Z3 = F.mul(F.add(Z1, Z1), H)
    if with_double:
        A = F.mul(X1, X1)
        Bv = F.mul(Y1, Y1)
        C = F.mul(Bv, Bv)
        tt = F.add(X1, Bv)
        D = F.sub(F.sub(F.mul(tt, tt), A), C)
        D = F.add(D, D)
        E = F.add(F.add(A, A), A)
        Fq = F.mul(E, E)
        dX = F.sub(Fq, F.add(D, D))
        C8 = F.add(C, C)
        C8 = F.add(C8, C8)
        C8 = F.add(C8, C8)
        dY = F.sub(F.mul(E, F.sub(D, dX)), C8)
        YZ = F.mul(Y1, Z1)
        dZ = F.add(YZ, YZ)
        X3 = F.select(is_double, dX, X3)
        Y3 = F.select(is_double, dY, Y3)
        Z3 = F.select(is_double, dZ, Z3)
    is_double = jnp.logical_and(is_double, jnp.logical_not(p_inf))
    Z3 = F.select(is_cancel, F.zero(Z3[0]), Z3)
    one_rows = F.one_mont(Z3[0])
    X3 = F.select(p_inf, Qx, X3)
    Y3 = F.select(p_inf, Qy, Y3)
    Z3 = F.select(p_inf, one_rows, Z3)
    return X3, Y3, Z3, is_double




# ---------------------------------------------------------------------------
# Elementwise field multiply over large arrays
# ---------------------------------------------------------------------------

_EMUL_S = 32  # sublane rows per block: 4096 elements, 256 KB/operand


def _emul_call(p: int, B: int, G: int, shared_b: bool, interpret: bool):
    """pallas_call: a (B, G, nl, S, 128) x b ((G,) or (B, G), nl, S, 128)
    -> same-shape product, Montgomery form."""
    import functools

    nl = field_spec(p).nl
    S = _EMUL_S
    F = field_for(p, None, compact=interpret)

    def kernel(a_ref, b_ref, o_ref):
        F.prep((S, 128))
        a = [a_ref[0, 0, i : i + 1] for i in range(nl)]
        if shared_b:
            b = [b_ref[0, i : i + 1] for i in range(nl)]
        else:
            b = [b_ref[0, 0, i : i + 1] for i in range(nl)]
        o_ref[0, 0] = _join(F.mul(a, b))

    b_spec = (
        pl.BlockSpec((1, nl, S, 128), lambda bi, gi: (gi, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        if shared_b
        else pl.BlockSpec((1, 1, nl, S, 128), lambda bi, gi: (bi, gi, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, 1, nl, S, 128), lambda bi, gi: (bi, gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            b_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, nl, S, 128),
                               lambda bi, gi: (bi, gi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, nl, S, 128), jnp.uint32),
        interpret=interpret,
    )


def _emul_pack(x: jnp.ndarray, B: int, L: int, nl: int):
    """(B, L, nl) -> (B, G, nl, S, 128) limb-major blocks (padded)."""
    S = _EMUL_S
    blk = S * 128
    G = -(-L // blk)
    xp = jnp.pad(x, ((0, 0), (0, G * blk - L), (0, 0)))
    return xp.reshape(B, G, S, 128, nl).transpose(0, 1, 4, 2, 3), G


def _emul_unpack(o: jnp.ndarray, L: int, nl: int):
    B, G = o.shape[0], o.shape[1]
    S = _EMUL_S
    return o.transpose(0, 1, 3, 4, 2).reshape(B, G * S * 128, nl)[:, :L]


def emul(p: int, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Batched elementwise Montgomery product via ONE Pallas kernel.

    a: (B, L, nl); b: (L, nl) (shared across the batch) or (B, L, nl).
    Replaces the XLA lax.scan CIOS for the prover's big elementwise
    multiplies — the scan streams a (B, L, nl+1) carry tensor through HBM
    once per limb (measured 85 ms for the h-pipeline matvec multiply at
    B=8, L=403k), while the kernel reads each operand once (~2 ms)."""
    B, L, nl = a.shape
    ab, G = _emul_pack(a, B, L, nl)
    if b.ndim == 2:
        bb, _ = _emul_pack(b[None], 1, L, nl)
        out = _emul_call(p, B, G, True, interpret)(ab, bb[0])
    else:
        bb, _ = _emul_pack(b, B, L, nl)
        out = _emul_call(p, B, G, False, interpret)(ab, bb)
    return _emul_unpack(out, L, nl)


def _ereduce_call(p: int, B: int, G: int, interpret: bool):
    """Lazy-sum reduction kernel (jfield.reduce_wide, fused): u32 column
    sums < 2^31 of Montgomery residues -> canonical field elements, in one
    pass (the XLA form streams the array through HBM ~5x: carry-sweep scan
    + two scan-CIOS muls + add)."""
    from ..fields.jfield import field_spec as _fs
    from ..fields.limbs import int_to_limbs

    spec = _fs(p)
    nl = spec.nl
    S = _EMUL_S
    F = field_for(p, None, compact=interpret)
    r_rows = [np.uint32(v) for v in spec.r_limbs]
    shift = (1 << (LIMB_BITS * nl)) * spec.r % p
    sh_rows = [np.uint32(v) for v in int_to_limbs(shift, nl)]

    def kernel(t_ref, o_ref):
        F.prep((S, 128))
        tail = (1, S, 128)
        rows = [t_ref[0, 0, i : i + 1] for i in range(nl)]
        res, carry = F.carry_sweep(rows)
        rr = [jnp.full(tail, v, jnp.uint32) for v in r_rows]
        lo = F.mul(res, rr)
        zero = jnp.zeros(tail, jnp.uint32)
        c_emb = [carry & _MASK, carry >> LIMB_BITS] + [zero] * (nl - 2)
        sh = [jnp.full(tail, v, jnp.uint32) for v in sh_rows]
        hi = F.mul(c_emb, sh)
        o_ref[0, 0] = _join(F.add(lo, hi))

    return pl.pallas_call(
        kernel,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, 1, nl, S, 128), lambda bi, gi: (bi, gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nl, S, 128),
                               lambda bi, gi: (bi, gi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, nl, S, 128), jnp.uint32),
        interpret=interpret,
    )


def ereduce_wide(p: int, t: jnp.ndarray, interpret: bool = False):
    """t (B, L, nl) u32 lazy sums -> field elements mod p (one kernel)."""
    B, L, nl = t.shape
    tb, G = _emul_pack(t, B, L, nl)
    out = _ereduce_call(p, B, G, interpret)(tb)
    return _emul_unpack(out, L, nl)


# ---------------------------------------------------------------------------
# Fused multiply-accumulate segment walk (sparse matvec)
# ---------------------------------------------------------------------------


def _mulacc_call(p: int, B: int, T: int, R: int, S: int, interpret: bool):
    """Sparse-matvec walk: per sorted COO record, one Montgomery multiply
    coeff*z and a LAZY u32 accumulation, flushing run sums on row-change /
    lane-end flags. Replaces gather -> emul -> XLA scatter segment_sum
    (the scatter ran at ~6 GB/s effective; this reads each operand once).

    Layout mirrors the MSM walk (msm_sorted.walk_kernel_factory): M =
    S*128 lanes, lane m owns K = T*R consecutive records of the row-sorted
    stream; flags bit0 = flush after this record (host-precomputed — the
    row structure is circuit-static). Outputs a per-record accumulator
    snapshot; flush positions are gathered and segment-summed downstream
    (both index sets are circuit-static too).

    z:     (B, K, nl, S, 128) gathered witness values (Montgomery)
    coeff: (K, nl, S, 128) Montgomery coefficients, shared over batch
    flags: (T, R, S, 128) u32
    out:   (B, K, nl, S, 128) u32 lazy sums (limbs < 2^16 * K)
    """
    nl = field_spec(p).nl
    F = field_for(p, None, compact=interpret)
    tail = (S, 128)

    def kernel(z_ref, c_ref, f_ref, o_ref, acc):
        F.prep(tail)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros((nl,) + tail, jnp.uint32)

        cur = [acc[i : i + 1] for i in range(nl)]
        for r in range(R):
            z_rows = [z_ref[0, r, i : i + 1] for i in range(nl)]
            c_rows = [c_ref[r, i : i + 1] for i in range(nl)]
            prod = F.mul(z_rows, c_rows)
            new = [cur[i] + prod[i] for i in range(nl)]
            o_ref[0, r] = _join(new)
            flg = f_ref[0, r : r + 1]  # (1, S, 128)
            flush = flg != 0
            cur = [jnp.where(flush, np.uint32(0), v) for v in new]
        acc[...] = _join(cur)

    return pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(
                (1, R, nl) + tail, lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (R, nl) + tail, lambda b, t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, R) + tail, lambda b, t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, R, nl) + tail, lambda b, t: (b, t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T * R, nl) + tail, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((nl,) + tail, jnp.uint32)],
        interpret=interpret,
    )


def mulacc_walk(
    p: int, z_walk: jnp.ndarray, coeff_walk: jnp.ndarray,
    flags_walk: jnp.ndarray, R: int, interpret: bool = False,
):
    """z_walk (B, K, nl, S, 128) x coeff_walk (K, nl, S, 128) -> per-record
    lazy-sum snapshots (B, K, nl, S, 128). flags_walk (T, R, S, 128)."""
    B, K, nl, S, _ = z_walk.shape
    T = K // R
    assert T * R == K, (K, R)
    return _mulacc_call(p, B, T, R, S, interpret)(z_walk, coeff_walk, flags_walk)
