"""Device fixed-base scalar multiplication for trusted-setup key generation.

Groth16/GM17 setup computes thousands-to-millions of group elements of the
form s_i * G for a *fixed* generator G (pk/vk query tables — the reference
delegates this to arkworks' FixedBase window tables inside
ark Groth16::circuit_specific_setup, reached from
zokrates_ark/src/groth16.rs:90). Round 1 did this with per-element host
double-and-add ladders (O(hours) at 2^20); this module is the TPU-native
replacement:

  * a window table T[w][d] = d * 2^(c*w) * G is built *on device* by
    batch-doubling concatenation (c steps per window, each a complete
    vectorized Jacobian add) — no host point math beyond one scalar mult,
  * the multi-scalar evaluation gathers one table row per c-bit digit and
    runs W complete mixed adds over the whole (m,) batch in one jit,
  * results convert to affine with a chunked Montgomery batch inversion
    (two lax.scans + one vectorized Fermat inverse).

Works unchanged for G1 and G2 (CurveOps is generic over the field namespace).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limbs import LIMB_BITS
from .jec import CurveOps, PointBatch


# ---------------------------------------------------------------------------
# Batch affine normalization
# ---------------------------------------------------------------------------


def batch_inverse(f, e: jnp.ndarray, lanes: int = 4096) -> jnp.ndarray:
    """Vectorized modular inverse of a batch of field elements.

    e: (M, *eshape) limb array. Zero entries invert to 0 (matching f.inv's
    Fermat convention). Cost: 2 muls/element + one vectorized Fermat
    inverse, via per-lane prefix-product scans.
    """
    esh = e.shape[1:]
    M = e.shape[0]
    L = min(lanes, max(1, 1 << (M - 1).bit_length()))
    K = -(-M // L)
    pad = K * L - M
    is_z = f.is_zero(e)
    ones = f.ones_mont((M,))
    e_safe = f.select(is_z, ones, e)
    if pad:
        e_safe = jnp.concatenate([e_safe, f.ones_mont((pad,))], axis=0)
    ek = e_safe.reshape((K, L) + esh)

    def fwd(carry, x):
        nxt = f.mul_(carry, x)
        return nxt, nxt

    init = f.ones_mont((L,))
    total, prefix = jax.lax.scan(fwd, init, ek)  # prefix: inclusive products
    tinv = f.inv_(total)

    def bwd(carry, xs):
        x, pprev = xs
        inv_x = f.mul_(carry, pprev)
        carry = f.mul_(carry, x)
        return carry, inv_x

    # exclusive prefix: shift the inclusive one down by a row
    excl = jnp.concatenate([init[None], prefix[:-1]], axis=0)
    _, invs = jax.lax.scan(bwd, tinv, (ek, excl), reverse=True)
    out = invs.reshape((K * L,) + esh)[:M]
    return f.select(is_z, jnp.zeros_like(out), out)


def batch_normalize(ops: CurveOps, P: PointBatch):
    """Jacobian batch -> (ax, ay, inf_mask) affine Montgomery arrays."""
    f = ops.f
    X, Y, Z = P
    inf = f.is_zero(Z)
    zinv = batch_inverse(f, Z)
    zinv2 = f.mul_(zinv, zinv)
    ax = f.mul_(X, zinv2)
    ay = f.mul_(Y, f.mul_(zinv2, zinv))
    return ax, ay, inf


# ---------------------------------------------------------------------------
# Window table
# ---------------------------------------------------------------------------


def build_table_host(gen, c: int, W: int):
    """Host window table: row w*2^c + d holds d * 2^(c*w) * G (affine).

    gen: a host group point (PointG1/PointG2). Pure integer EC adds —
    ~W*2^c of them (0.2s at c=8, seconds at c=16) — done once per
    (curve, group) and reused for every setup. Host build sidesteps the
    pathological XLA:CPU compile of a W-window device build and yields
    already-affine rows (no batch inversion needed for the table).

    Returns (xs, ys, inf) host lists in the field encoding expected by
    CurveOps.f.encode (ints for G1, (c0, c1) pairs for G2).
    """
    zero = gen.curve.zero()
    ext = hasattr(gen.x, "c0")

    def coords(p):
        if p.infinity:
            return ((0, 0), (1, 0)) if ext else (0, 1)
        if ext:
            return ((p.x.c0, p.x.c1), (p.y.c0, p.y.c1))
        return (p.x, p.y)

    xs, ys, inf = [], [], []
    base = gen
    for _ in range(W):
        acc = zero
        for d in range(1 << c):
            x, y = coords(acc)
            xs.append(x)
            ys.append(y)
            inf.append(acc.infinity)
            acc = acc + base
        base = base * (1 << c)
    return xs, ys, inf


# ---------------------------------------------------------------------------
# Fixed-base MSM
# ---------------------------------------------------------------------------


def _digits(S: jnp.ndarray, c: int, W: int) -> jnp.ndarray:
    """(m, nls) u32 canonical 16-bit limbs -> (m, W) c-bit digit indices."""
    per = LIMB_BITS // c
    mask = np.uint32((1 << c) - 1)
    cols = []
    for w in range(W):
        limb = w // per
        sh = np.uint32((w % per) * c)
        if limb < S.shape[1]:
            cols.append((S[:, limb] >> sh) & mask)
        else:
            cols.append(jnp.zeros((S.shape[0],), jnp.uint32))
    return jnp.stack(cols, axis=1)


def fixed_base_msm(
    ops: CurveOps, table_aff, c: int, W: int, S: jnp.ndarray
) -> PointBatch:
    """s_i * G for each row of S, via the affine window table.

    table_aff: (tx, ty, tinf) from table_affine(). S: (m, nls) canonical
    u32 limbs. Returns a Jacobian batch (m,). Traceable (composes in jit).
    """
    tx, ty, tinf = table_aff
    d = _digits(S, c, W)  # (m, W)
    m = S.shape[0]
    offs = (jnp.arange(W, dtype=jnp.uint32) << c)[:, None]
    idx_all = (d.T + offs).astype(jnp.int32)  # (W, m)

    def body(acc, idx):
        qx = jnp.take(tx, idx, axis=0)
        qy = jnp.take(ty, idx, axis=0)
        qi = jnp.take(tinf, idx, axis=0)
        return ops.mixed_add(acc, qx, qy, q_inf=qi), None

    acc, _ = jax.lax.scan(body, ops.infinity((m,)), idx_all)
    return acc


class FixedBase:
    """Cached device window-table evaluator for one (group, generator)."""

    def __init__(self, ops: CurveOps, gen_point, c: int = 8, bits: int = 256):
        self.ops = ops
        self.c = c
        self.W = -(-bits // c)
        xs, ys, inf = build_table_host(gen_point, c, self.W)
        f = ops.f
        self.table = (
            f.encode(xs),
            f.encode(ys),
            jnp.asarray(np.asarray(inf, dtype=bool)),
        )
        self._jit = jax.jit(
            functools.partial(fixed_base_msm, ops, self.table, c, self.W)
        )

    def __call__(self, S: jnp.ndarray) -> PointBatch:
        return self._jit(S)

    def to_affine(self, S: jnp.ndarray):
        return batch_normalize(self.ops, self._jit(S))


_FB_CACHE = {}


def fixed_base_for(curve: str, group: str, c: int | None = None) -> FixedBase:
    """FixedBase for a curve's G1/G2 generator. c defaults to 8: the host
    table build is W*2^c integer EC adds (~0.2s G1 / ~1s G2), done once
    per process, and the evaluation cost W mixed adds per element."""
    if c is None:
        c = 8
    key = (curve, group, c)
    if key not in _FB_CACHE:
        from ..ec.curve import g1_group, g2_group
        from .jec import curve_ops, curve_ops_g2

        if group == "g1":
            grp = g1_group(curve)
            ops = curve_ops(grp.q)
        else:
            grp = g2_group(curve)
            ops = curve_ops_g2(curve)
        bits = grp.r.bit_length() + c  # headroom for the top window
        _FB_CACHE[key] = FixedBase(ops, grp.generator(), c=c, bits=bits)
    return _FB_CACHE[key]
