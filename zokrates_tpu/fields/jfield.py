"""Batched prime-field arithmetic on device (JAX), in Montgomery form.

This is the TPU compute layer the reference delegates to arkworks for
(vendored ark-ff bigint arithmetic, multicore via rayon —
zokrates_ark/Cargo.toml:6-17). Instead of 64-bit scalar limbs + carry chains,
we use a vector-friendly design:

  * base-2^16 limbs held in uint32 lanes (products fit exactly, columns
    accumulate lazily without per-step carries),
  * CIOS Montgomery multiplication with deferred carries,
  * carry/borrow propagation as `lax.scan`s over the limb axis — tiny
    XLA graphs, which matters enormously: EC formulas instantiate these
    primitives dozens of times inside loop bodies, and unrolled carry
    chains made a single Pippenger kernel minutes-slow to compile,
  * everything batched over leading axes so the VPU sees wide elementwise
    work; the MSM/NTT kernels build on these ops.

All ops are pure functions of uint32 arrays -> jittable, shardable with
pjit/shard_map over the batch axis.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints, n_limbs

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
_B = np.uint32(1 << LIMB_BITS)

# Unroll factor for the limb-axis scans. 1 keeps XLA graphs tiny (fast
# compile — right for CPU tests and cold TPU sessions); higher values
# trade compile time for much lower While-loop overhead on TPU (each scan
# iteration costs ~1-2us of loop overhead, and a Montgomery mul runs nl of
# them). bench.py sets ZOKRATES_TPU_UNROLL=16.
_UNROLL = max(1, int(os.environ.get("ZOKRATES_TPU_UNROLL", "1")))


@dataclass(frozen=True)
class FieldSpec:
    """Static (host-side) constants for one prime field's device arithmetic."""

    p: int
    nl: int                      # number of 16-bit limbs
    n0inv: int                   # -p^-1 mod 2^16
    r: int                       # Montgomery radix B^nl mod p
    r2: int                      # R^2 mod p
    p_limbs: np.ndarray          # (nl,)
    r_limbs: np.ndarray          # (nl,)  == one in Montgomery form
    r2_limbs: np.ndarray         # (nl,)
    zero_limbs: np.ndarray       # (nl,)

    @staticmethod
    def make(p: int) -> "FieldSpec":
        nl = n_limbs(p)
        B = 1 << LIMB_BITS
        n0inv = (-pow(p, -1, B)) % B
        R = pow(1 << (LIMB_BITS * nl), 1, p)
        R2 = (R * R) % p
        return FieldSpec(
            p=p,
            nl=nl,
            n0inv=n0inv,
            r=R,
            r2=R2,
            p_limbs=int_to_limbs(p, nl),
            r_limbs=int_to_limbs(R, nl),
            r2_limbs=int_to_limbs(R2, nl),
            zero_limbs=np.zeros(nl, dtype=np.uint32),
        )


_SPECS = {}


def field_spec(p: int) -> FieldSpec:
    if p not in _SPECS:
        _SPECS[p] = FieldSpec.make(p)
    return _SPECS[p]


# ---------------------------------------------------------------------------
# Limb-axis scan helpers (each compiles to a single small While loop)
# ---------------------------------------------------------------------------


def _carry_sweep(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Propagate carries so every limb is < 2^16. t: (..., nl) uint32 with
    column values possibly up to 2^32. Returns (normalized, carry_out)."""
    tw = jnp.moveaxis(t, -1, 0)

    def body(carry, col):
        s = col + carry
        return s >> LIMB_BITS, s & _MASK

    carry0 = jnp.zeros(t.shape[:-1], dtype=_U32)
    carry, cols = jax.lax.scan(body, carry0, tw, unroll=_UNROLL)
    return jnp.moveaxis(cols, 0, -1), carry


def _borrow_sub(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(a - b) limbwise with borrow chain; limbs of a may be >= 2^16 only in
    the topmost position is NOT allowed — inputs must be normalized.
    Returns (diff mod B^nl, borrow_out in {0,1})."""
    aw = jnp.moveaxis(a, -1, 0)
    bw = jnp.moveaxis(b, -1, 0)

    def body(borrow, ab):
        ai, bi = ab
        d = (ai + _B) - bi - borrow
        return jnp.where(d >> LIMB_BITS == 0, np.uint32(1), np.uint32(0)), d & _MASK

    borrow0 = jnp.zeros(a.shape[:-1], dtype=_U32)
    borrow, cols = jax.lax.scan(body, borrow0, (aw, bw), unroll=_UNROLL)
    return jnp.moveaxis(cols, 0, -1), borrow


# ---------------------------------------------------------------------------
# Core ops (all take/return (..., nl) uint32 in Montgomery form)
# ---------------------------------------------------------------------------


def make_ops(p: int):
    """Build the jit-ready op set for modulus p. Returns a namespace object."""
    spec = field_spec(p)
    nl = spec.nl
    n0inv = np.uint32(spec.n0inv)
    p_l = jnp.asarray(spec.p_limbs)

    def _cond_sub_p(t, hi):
        """Reduce t + hi*B^nl (< 2p) into [0, p)."""
        d, borrow = _borrow_sub(t, jnp.broadcast_to(p_l, t.shape))
        use_d = jnp.logical_or(hi > 0, borrow == 0)
        return jnp.where(use_d[..., None], d, t)

    def add(a, b):
        a, b = jnp.broadcast_arrays(a, b)
        s, carry = _carry_sweep(a + b)
        return _cond_sub_p(s, carry)

    def neg(a):
        d, _ = _borrow_sub(jnp.broadcast_to(p_l, a.shape), a)
        is_zero_ = jnp.all(a == 0, axis=-1)
        return jnp.where(is_zero_[..., None], a, d)

    def sub(a, b):
        return add(a, neg(b))

    def mul(a, b):
        """CIOS Montgomery product with lazy carries.

        Scans over the nl words of `a`; the inner loops are vectorized over
        the limb axis so the trace is O(1) in nl. Column invariant: each
        uint32 column accumulates at most ~4*nl 16-bit terms plus round
        carries => < 2^24 for nl<=48, far below 2^32.
        """
        a, b = jnp.broadcast_arrays(a, b)
        shape = a.shape[:-1]
        pad_cfg = [(0, 0)] * len(shape)

        def accumulate(t, factor, vec):
            prod = factor[..., None] * vec  # (..., nl) uint32, exact
            lo = jnp.pad(prod & _MASK, pad_cfg + [(0, 1)])
            hi = jnp.pad(prod >> LIMB_BITS, pad_cfg + [(1, 0)])
            return t + lo + hi

        def body(t, ai):
            t = accumulate(t, ai, b)
            m = (t[..., 0] * n0inv) & _MASK
            t = accumulate(t, m, p_l)
            carry = t[..., 0] >> LIMB_BITS
            t = jnp.concatenate(
                [t[..., 1:], jnp.zeros(shape + (1,), dtype=_U32)], axis=-1
            )
            return t.at[..., 0].add(carry), None

        t0 = jnp.zeros(shape + (nl + 1,), dtype=_U32)
        a_words = jnp.moveaxis(a, -1, 0)  # (nl, ...)
        t, _ = jax.lax.scan(body, t0, a_words, unroll=_UNROLL)
        res, hi = _carry_sweep(t[..., :nl])
        hi = hi + t[..., nl]
        return _cond_sub_p(res, hi)

    def square(a):
        return mul(a, a)

    def pow_const(a, e: int):
        """a^e for host-known integer e (lax.scan over exponent bits)."""
        if e == 0:
            return jnp.broadcast_to(jnp.asarray(spec.r_limbs), a.shape).astype(_U32)
        bits = jnp.asarray([int(b) for b in bin(e)[3:]], dtype=jnp.bool_)

        def body(acc, bit):
            acc = mul(acc, acc)
            acc = jnp.where(bit, mul(acc, a), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, a, bits)
        return acc

    def inv(a):
        """Fermat inverse a^(p-2). inv(0) = 0 by convention."""
        return pow_const(a, p - 2)

    def reduce_wide(t):
        """Lazy-sum reduction: t (..., nl) uint32 whose limbs are column
        sums < 2^31 of (16-bit-limb) field residues -> the sum mod p.

        Used after u32 segment_sum accumulation (the device sparse matvec):
        V = lo + carry*B^nl with lo 16-bit-normalized; both parts fold back
        into [0, p) with one Montgomery multiplication each (mul by R gives
        x*R*R^-1 = x mod p)."""
        res, carry = _carry_sweep(t)
        r_mont = jnp.broadcast_to(jnp.asarray(spec.r_limbs), res.shape).astype(_U32)
        lo = mul(res, r_mont)
        c_emb = jnp.zeros_like(res).at[..., 0].set(carry & _MASK).at[..., 1].set(carry >> LIMB_BITS)
        shift_mont = (1 << (LIMB_BITS * nl)) * spec.r % p
        sh = jnp.broadcast_to(jnp.asarray(int_to_limbs(shift_mont, nl)), res.shape).astype(_U32)
        hi = mul(c_emb, sh)
        return add(lo, hi)

    def to_mont(a):
        return mul(a, jnp.broadcast_to(jnp.asarray(spec.r2_limbs), a.shape).astype(_U32))

    def from_mont(a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return mul(a, one)

    def select(cond, a, b):
        """cond ? a : b, cond shape (...) matching leading dims."""
        return jnp.where(cond[..., None], a, b)

    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    def eq(a, b):
        return jnp.all(a == b, axis=-1)

    def zeros(shape=()):
        return jnp.zeros(tuple(shape) + (nl,), dtype=_U32)

    def ones_mont(shape=()):
        return jnp.broadcast_to(jnp.asarray(spec.r_limbs), tuple(shape) + (nl,)).astype(_U32)

    # host converters ------------------------------------------------------
    def encode(xs, mont: bool = True):
        """list[int] -> device limb array ((N, nl)), optionally Montgomery."""
        arr = ints_to_limbs([x % p for x in xs], nl)
        out = jnp.asarray(arr)
        return to_mont(out) if mont else out

    def encode_scalar(x: int, mont: bool = True):
        arr = int_to_limbs(x % p, nl)
        out = jnp.asarray(arr)
        return to_mont(out[None])[0] if mont else out

    def decode(arr, mont: bool = True):
        """device limb array -> list[int] (canonical)."""
        a = from_mont(arr) if mont else arr
        a = np.asarray(jax.device_get(a))
        flat = a.reshape(-1, nl)
        return limbs_to_ints(flat)

    ns = type("FieldOps", (), {})()
    ns.spec = spec
    ns.nl = nl
    ns.p = p
    ns.element_ndim = 1
    # jitted entry points (retraced per input shape; callable inside jit too)
    ns.add = jax.jit(add)
    ns.sub = jax.jit(sub)
    ns.neg = jax.jit(neg)
    ns.mul = jax.jit(mul)
    ns.square = jax.jit(square)
    ns.pow_const = jax.jit(pow_const, static_argnums=1)
    ns.inv = jax.jit(inv)
    ns.to_mont = jax.jit(to_mont)
    ns.from_mont = jax.jit(from_mont)
    ns.to_mont_ = to_mont
    ns.from_mont_ = from_mont
    # raw traceable versions for composition into larger kernels
    ns.add_ = add
    ns.sub_ = sub
    ns.neg_ = neg
    ns.mul_ = mul
    ns.inv_ = inv
    ns.pow_const_ = pow_const
    ns.reduce_wide_ = reduce_wide
    ns.select = select
    ns.is_zero = is_zero
    ns.eq = eq
    ns.zeros = zeros
    ns.ones_mont = ones_mont
    ns.encode = encode
    ns.encode_scalar = encode_scalar
    ns.decode = decode
    return ns


_OPS_CACHE = {}


def field_ops(p: int):
    if p not in _OPS_CACHE:
        _OPS_CACHE[p] = make_ops(p)
    return _OPS_CACHE[p]
