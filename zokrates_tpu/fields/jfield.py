"""Batched prime-field arithmetic on device (JAX), in Montgomery form.

This is the TPU compute layer the reference delegates to arkworks for
(vendored ark-ff bigint arithmetic, enabled multicore via rayon —
zokrates_ark/Cargo.toml:6-17). Instead of 64-bit scalar limbs + carry chains,
we use a vector-friendly design:

  * base-2^16 limbs held in uint32 lanes (products fit exactly, columns
    accumulate lazily without per-step carries),
  * CIOS Montgomery multiplication with the carry propagation deferred to a
    single final normalization pass,
  * everything batched over a leading axis so the VPU sees wide elementwise
    work; the MSM/NTT kernels build on these ops.

All ops are pure functions of uint32 arrays -> jittable, shardable with
pjit/shard_map over the batch axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints, n_limbs

_U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


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
# Normalization helpers
# ---------------------------------------------------------------------------


def _carry_sweep(t: jnp.ndarray, rounds: int = 1) -> jnp.ndarray:
    """Propagate carries so every limb is < 2^16.

    One sweep moves each limb's high bits one position up; after a sweep the
    limbs are < 2^16 + (carry bits), and since input columns are < 2^32 a
    single full sequential sweep suffices. t: (..., nl) uint32, interpreted
    with the final limb allowed to keep overflow (caller manages width).
    """
    nl = t.shape[-1]
    out = [t[..., i] for i in range(nl)]
    carry = jnp.zeros_like(out[0])
    for i in range(nl):
        s = out[i] + carry
        out[i] = s & _MASK
        carry = s >> LIMB_BITS
    return jnp.stack(out, axis=-1), carry


def _ge(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic >= on limb vectors (most-significant decides)."""
    nl = a.shape[-1]
    ge = jnp.ones(a.shape[:-1], dtype=bool)
    # scan from least significant: ge = (a_i > b_i) | (a_i == b_i) & ge
    for i in range(nl):
        ai, bi = a[..., i], b[..., i]
        ge = jnp.where(ai == bi, ge, ai > bi)
    return ge


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b on limb vectors, assuming a >= b. Borrow-propagating."""
    nl = a.shape[-1]
    out = []
    borrow = jnp.zeros(a.shape[:-1], dtype=_U32)
    for i in range(nl):
        # work in uint32 with an offset to avoid underflow
        d = (a[..., i] + (np.uint32(1) << LIMB_BITS)) - b[..., i] - borrow
        out.append(d & _MASK)
        borrow = jnp.where(d >> LIMB_BITS == 0, np.uint32(1), np.uint32(0))
    return jnp.stack(out, axis=-1)


def _add_limbs(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    s = a + b  # limbs < 2^16 so no overflow in uint32
    return _carry_sweep(s)


def _cond_sub_p(t: jnp.ndarray, p_limbs: jnp.ndarray, extra: jnp.ndarray) -> jnp.ndarray:
    """Reduce t (< 2p, with `extra` as the 2^(16*nl) overflow bit) into [0,p)."""
    need = jnp.logical_or(extra > 0, _ge(t, p_limbs))
    reduced = _sub_limbs_with_hi(t, extra, p_limbs)
    return jnp.where(need[..., None], reduced, t)


def _sub_limbs_with_hi(a: jnp.ndarray, a_hi: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a_hi*B^nl + a) - b, result assumed < B^nl."""
    nl = a.shape[-1]
    out = []
    borrow = jnp.zeros(a.shape[:-1], dtype=_U32)
    for i in range(nl):
        d = (a[..., i] + (np.uint32(1) << LIMB_BITS)) - b[..., i] - borrow
        out.append(d & _MASK)
        borrow = jnp.where(d >> LIMB_BITS == 0, np.uint32(1), np.uint32(0))
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Core ops (all take/return (..., nl) uint32 in Montgomery form)
# ---------------------------------------------------------------------------


def make_ops(p: int):
    """Build the jit-ready op set for modulus p. Returns a namespace object."""
    spec = field_spec(p)
    nl = spec.nl
    n0inv = np.uint32(spec.n0inv)
    p_l = jnp.asarray(spec.p_limbs)

    def add(a, b):
        s, carry = _add_limbs(a, b)
        return _cond_sub_p(s, p_l, carry)

    def sub(a, b):
        # a - b mod p: add p first to avoid underflow, then normalize
        s, carry = _add_limbs(a, jnp.broadcast_to(p_l, a.shape))
        # s = a + p (carry possible), then subtract b
        t = _sub_limbs_with_hi_carry(s, carry, b)
        t_limbs, t_hi = t
        return _cond_sub_p(t_limbs, p_l, t_hi)

    def _sub_limbs_with_hi_carry(s_pair_limbs, s_hi, b):
        out = []
        borrow = jnp.zeros(s_pair_limbs.shape[:-1], dtype=_U32)
        for i in range(nl):
            d = (s_pair_limbs[..., i] + (np.uint32(1) << LIMB_BITS)) - b[..., i] - borrow
            out.append(d & _MASK)
            borrow = jnp.where(d >> LIMB_BITS == 0, np.uint32(1), np.uint32(0))
        hi = s_hi - borrow  # s_hi in {0,1}; a+p >= b always, so no net underflow
        return jnp.stack(out, axis=-1), hi

    def neg(a):
        # p - a, with -0 = 0
        is_zero = jnp.all(a == 0, axis=-1)
        r = _sub_limbs(jnp.broadcast_to(p_l, a.shape), a)
        return jnp.where(is_zero[..., None], a, r)

    def mul(a, b):
        """CIOS Montgomery product with lazy carries.

        Scans over the nl words of `a`; the inner loops are vectorized over
        the limb axis so the trace is O(1) in nl (compile time matters: the
        fully unrolled form takes XLA minutes to compile). Column invariant:
        each uint32 column accumulates at most ~4*nl 16-bit terms plus round
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
        t, _ = jax.lax.scan(body, t0, a_words)
        res, hi = _carry_sweep(t[..., :nl])
        hi = hi + t[..., nl]
        return _cond_sub_p(res, p_l, hi)

    def square(a):
        return mul(a, a)

    def pow_const(a, e: int):
        """a^e for host-known integer e.

        Left-to-right binary ladder driven by `lax.scan` over the exponent's
        bit vector, so the trace stays O(1) in exponent size (the unrolled
        alternative is ~1000 Montgomery products for a Fermat inverse).
        """
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
    # raw traceable versions for composition into larger kernels
    ns.add_ = add
    ns.sub_ = sub
    ns.neg_ = neg
    ns.mul_ = mul
    ns.inv_ = inv
    ns.pow_const_ = pow_const
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
