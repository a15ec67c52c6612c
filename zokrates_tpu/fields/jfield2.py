"""Batched quadratic-extension field ops on device: Fq2 = Fq[u]/(u^2 - beta).

Element layout: (..., 2, nl) uint32 — c0 and c1 stacked on the second-to-last
axis, each a Montgomery limb vector. The namespace exposes the same API as
fields/jfield.py (mul/add/sub/neg/select/is_zero/zeros/ones_mont/encode/
decode), which lets kernels/jec.py CurveOps run unchanged over G2 points —
one Jacobian formula set serves both groups (the reference needs separate
arkworks instantiations per group).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .jfield import field_ops


def make_ops2(q: int, beta: int):
    base = field_ops(q)
    nl = base.nl
    beta_mont = base.encode_scalar(beta % q)

    def _mul_beta(x):
        return base.mul_(x, jnp.broadcast_to(beta_mont, x.shape))

    def add(a, b):
        return base.add_(a, b)

    def sub(a, b):
        return base.sub_(a, b)

    def neg(a):
        return base.neg_(a)

    def mul(a, b):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = base.mul_(a0, b0)
        t1 = base.mul_(a1, b1)
        t2 = base.mul_(base.add_(a0, a1), base.add_(b0, b1))
        c0 = base.add_(t0, _mul_beta(t1))
        c1 = base.sub_(base.sub_(t2, t0), t1)
        return jnp.stack([c0, c1], axis=-2)

    def square(a):
        return mul(a, a)

    def inv(a):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = base.sub_(base.mul_(a0, a0), _mul_beta(base.mul_(a1, a1)))
        ninv = base.inv_(norm)
        return jnp.stack(
            [base.mul_(a0, ninv), base.neg_(base.mul_(a1, ninv))], axis=-2
        )

    def select(cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    def is_zero(a):
        return jnp.all(a == 0, axis=(-1, -2))

    def zeros(shape=()):
        return jnp.zeros(tuple(shape) + (2, nl), dtype=jnp.uint32)

    def ones_mont(shape=()):
        one = jnp.stack([jnp.asarray(base.spec.r_limbs), np.zeros(nl, np.uint32)])
        return jnp.broadcast_to(one, tuple(shape) + (2, nl)).astype(jnp.uint32)

    def encode(pairs, mont=True):
        """list of (c0, c1) int tuples -> (N, 2, nl) device array."""
        flat = []
        for c0, c1 in pairs:
            flat += [c0, c1]
        arr = base.encode(flat, mont=mont)
        return arr.reshape(len(pairs), 2, nl)

    def decode(arr, mont=True):
        flat = base.decode(arr.reshape(-1, nl), mont=mont)
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(len(flat) // 2)]

    ns = type("Field2Ops", (), {})()
    ns.base = base
    ns.nl = nl
    ns.element_ndim = 2
    ns.q = q
    ns.beta = beta
    ns.add = jax.jit(add)
    ns.sub = jax.jit(sub)
    ns.mul = jax.jit(mul)
    ns.inv = jax.jit(inv)
    ns.add_ = add
    ns.sub_ = sub
    ns.neg_ = neg
    ns.mul_ = mul
    ns.inv_ = inv
    ns.square_ = square
    ns.select = select
    ns.is_zero = is_zero
    ns.zeros = zeros
    ns.ones_mont = ones_mont
    ns.encode = encode
    ns.decode = decode
    return ns


_OPS2_CACHE = {}


def field_ops2(q: int, beta: int):
    key = (q, beta)
    if key not in _OPS2_CACHE:
        _OPS2_CACHE[key] = make_ops2(q, beta)
    return _OPS2_CACHE[key]
