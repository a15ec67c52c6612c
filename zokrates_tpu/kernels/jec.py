"""Batched elliptic-curve point arithmetic on device (JAX over limb vectors).

The counterpart of arkworks' ark-ec group ops that the reference's provers
lean on (vendored under zokrates_ark; parallelized there with rayon —
zokrates_ark/Cargo.toml:6-17). Here every op is data-parallel over a batch
axis of points, in Jacobian coordinates over the Montgomery-limb field ops
from fields/jfield.py.

All supported curves have a = 0 (y^2 = x^3 + b), which the doubling formula
exploits. Infinity is encoded as Z == 0; formulas select around the edge
cases so the ops are *complete* over the batch (no data-dependent branches —
XLA requirement).

Layout: a point batch is a tuple (X, Y, Z) of (..., nl) uint32 arrays.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.jfield import field_ops

PointBatch = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


class CurveOps:
    """Device ops for an a=0 short-Weierstrass group over any field namespace
    (base field for G1, quadratic extension for G2 — same formulas)."""

    def __init__(self, f, key=None):
        self.f = f
        self.key = key
        # jitted entry points (the plain methods remain traceable for
        # composition inside larger jitted kernels)
        self.add_jit = jax.jit(self.add)
        self.double_jit = jax.jit(self.double)
        self.mixed_add_jit = jax.jit(self.mixed_add)
        self.tree_reduce_jit = jax.jit(self.tree_reduce)

    # -- construction ------------------------------------------------------
    def infinity(self, shape=()) -> PointBatch:
        z = self.f.zeros(shape)
        one = self.f.ones_mont(shape)
        return (one, one, z)

    def from_affine_ints(self, xs, ys):
        """Host lists of affine coords -> device Jacobian batch (Z=1)."""
        X = self.f.encode(xs)
        Y = self.f.encode(ys)
        Z = self.f.ones_mont((len(xs),))
        return (X, Y, Z)

    def from_points(self, pts):
        """List of host PointG1/PointG2 -> device batch (infinities allowed).
        For G2, coordinates are tower.Fq2 objects."""
        ext = hasattr(self.f, "base")
        if ext:
            xs = [(0, 0) if p.infinity else (p.x.c0, p.x.c1) for p in pts]
            ys = [(1, 0) if p.infinity else (p.y.c0, p.y.c1) for p in pts]
            zs = [(0, 0) if p.infinity else (1, 0) for p in pts]
        else:
            xs = [0 if p.infinity else p.x for p in pts]
            ys = [1 if p.infinity else p.y for p in pts]
            zs = [0 if p.infinity else 1 for p in pts]
        X = self.f.encode(xs)
        Y = self.f.encode(ys)
        Z = self.f.encode(zs)
        return (X, Y, Z)

    def to_affine_ints(self, P: PointBatch):
        """Device batch -> host list of (x, y) or None for infinity."""
        X, Y, Z = P
        f = self.f
        zinv = f.inv(Z)
        zinv2 = f.mul(zinv, zinv)
        zinv3 = f.mul(zinv2, zinv)
        ax = f.decode(f.mul(X, zinv2))
        ay = f.decode(f.mul(Y, zinv3))
        inf = np.asarray(jax.device_get(f.is_zero(Z))).reshape(-1)
        out = []
        for i in range(len(ax)):
            out.append(None if inf[i] else (ax[i], ay[i]))
        return out

    # -- group law ---------------------------------------------------------
    def double(self, P: PointBatch) -> PointBatch:
        """dbl-2009-l (a=0). Maps infinity to infinity (Z3 = 2YZ = 0)."""
        f = self.f
        X, Y, Z = P
        A = f.mul_(X, X)
        B = f.mul_(Y, Y)
        C = f.mul_(B, B)
        t = f.add_(X, B)
        D = f.sub_(f.sub_(f.mul_(t, t), A), C)
        D = f.add_(D, D)
        E = f.add_(f.add_(A, A), A)
        F = f.mul_(E, E)
        X3 = f.sub_(F, f.add_(D, D))
        C8 = f.add_(C, C)
        C8 = f.add_(C8, C8)
        C8 = f.add_(C8, C8)
        Y3 = f.sub_(f.mul_(E, f.sub_(D, X3)), C8)
        YZ = f.mul_(Y, Z)
        Z3 = f.add_(YZ, YZ)
        return (X3, Y3, Z3)

    def add(self, P: PointBatch, Q: PointBatch) -> PointBatch:
        """Complete Jacobian add (add-2007-bl + select-based edge handling)."""
        f = self.f
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        p_inf = f.is_zero(Z1)
        q_inf = f.is_zero(Z2)

        Z1Z1 = f.mul_(Z1, Z1)
        Z2Z2 = f.mul_(Z2, Z2)
        U1 = f.mul_(X1, Z2Z2)
        U2 = f.mul_(X2, Z1Z1)
        S1 = f.mul_(f.mul_(Y1, Z2), Z2Z2)
        S2 = f.mul_(f.mul_(Y2, Z1), Z1Z1)
        H = f.sub_(U2, U1)
        R = f.sub_(S2, S1)

        same_x = f.is_zero(H)
        same_y = f.is_zero(R)
        is_double = jnp.logical_and(same_x, same_y)
        is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))

        H2 = f.add_(H, H)
        I = f.mul_(H2, H2)
        J = f.mul_(H, I)
        R2 = f.add_(R, R)
        V = f.mul_(U1, I)
        R2sq = f.mul_(R2, R2)
        X3 = f.sub_(f.sub_(R2sq, J), f.add_(V, V))
        S1J = f.mul_(S1, J)
        Y3 = f.sub_(f.mul_(R2, f.sub_(V, X3)), f.add_(S1J, S1J))
        Zs = f.add_(Z1, Z2)
        Z3 = f.mul_(f.sub_(f.sub_(f.mul_(Zs, Zs), Z1Z1), Z2Z2), H)

        D = self.double(P)

        def sel(c, a, b):
            return f.select(c, a, b)

        # priority: P inf -> Q; Q inf -> P; cancel -> inf; double -> 2P; else add
        zero = jnp.zeros_like(Z3)
        X3 = sel(is_double, D[0], X3)
        Y3 = sel(is_double, D[1], Y3)
        Z3 = sel(is_double, D[2], Z3)
        Z3 = sel(is_cancel, zero, Z3)
        X3 = sel(q_inf, X1, sel(p_inf, X2, X3))
        Y3 = sel(q_inf, Y1, sel(p_inf, Y2, Y3))
        Z3 = sel(q_inf, Z1, sel(p_inf, Z2, Z3))
        return (X3, Y3, Z3)

    def mixed_add(self, P: PointBatch, Qx, Qy, q_inf=None) -> PointBatch:
        """P + (Qx, Qy) with Q affine (Z2 = 1). ~30% cheaper than general add.
        q_inf: optional bool array marking affine slots that are infinity."""
        f = self.f
        X1, Y1, Z1 = P
        p_inf = f.is_zero(Z1)

        Z1Z1 = f.mul_(Z1, Z1)
        U2 = f.mul_(Qx, Z1Z1)
        S2 = f.mul_(f.mul_(Qy, Z1), Z1Z1)
        H = f.sub_(U2, X1)
        R = f.sub_(S2, Y1)

        same_x = f.is_zero(H)
        same_y = f.is_zero(R)
        is_double = jnp.logical_and(same_x, same_y)
        is_cancel = jnp.logical_and(same_x, jnp.logical_not(same_y))

        H2 = f.add_(H, H)
        I = f.mul_(H2, H2)
        J = f.mul_(H, I)
        R2 = f.add_(R, R)
        V = f.mul_(X1, I)
        R2sq = f.mul_(R2, R2)
        X3 = f.sub_(f.sub_(R2sq, J), f.add_(V, V))
        Y1J = f.mul_(Y1, J)
        Y3 = f.sub_(f.mul_(R2, f.sub_(V, X3)), f.add_(Y1J, Y1J))
        Z3 = f.mul_(f.add_(Z1, Z1), H)  # 2*Z1*H  (since (Z1+1)^2-Z1^2-1 = 2Z1)

        D = self.double(P)
        zero = jnp.zeros_like(Z3)
        one = f.ones_mont(Z3.shape[: Z3.ndim - f.element_ndim])

        sel = f.select
        X3 = sel(is_double, D[0], X3)
        Y3 = sel(is_double, D[1], Y3)
        Z3 = sel(is_double, D[2], Z3)
        Z3 = sel(is_cancel, zero, Z3)
        # P at infinity -> affine Q
        X3 = sel(p_inf, Qx, X3)
        Y3 = sel(p_inf, Qy, Y3)
        Z3 = sel(p_inf, one, Z3)
        if q_inf is not None:
            X3 = sel(q_inf, X1, X3)
            Y3 = sel(q_inf, Y1, Y3)
            Z3 = sel(q_inf, Z1, Z3)
        return (X3, Y3, Z3)

    def neg(self, P: PointBatch) -> PointBatch:
        X, Y, Z = P
        return (X, self.f.neg_(Y), Z)

    def select(self, cond, P: PointBatch, Q: PointBatch) -> PointBatch:
        s = self.f.select
        return (s(cond, P[0], Q[0]), s(cond, P[1], Q[1]), s(cond, P[2], Q[2]))

    # -- reductions --------------------------------------------------------
    def tree_reduce(self, P: PointBatch) -> PointBatch:
        """Sum a batch of points along axis 0 by pairwise halving (log depth)."""
        X, Y, Z = P
        n = X.shape[0]
        while n > 1:
            half = n // 2
            even = (X[0 : 2 * half : 2], Y[0 : 2 * half : 2], Z[0 : 2 * half : 2])
            odd = (X[1 : 2 * half : 2], Y[1 : 2 * half : 2], Z[1 : 2 * half : 2])
            red = self.add(even, odd)
            if n % 2:
                red = (
                    jnp.concatenate([red[0], X[-1:]], axis=0),
                    jnp.concatenate([red[1], Y[-1:]], axis=0),
                    jnp.concatenate([red[2], Z[-1:]], axis=0),
                )
            X, Y, Z = red
            n = X.shape[0]
        return (X, Y, Z)


_CURVE_OPS = {}


def curve_ops(q: int, b: int = 0) -> CurveOps:
    """G1 device ops for base field q (b unused: all curves have a=0 and the
    group law never references b)."""
    from ..fields.jfield import field_ops

    key = ("g1", q)
    if key not in _CURVE_OPS:
        _CURVE_OPS[key] = CurveOps(field_ops(q), key)
    return _CURVE_OPS[key]


def curve_ops_g2(curve: str) -> CurveOps:
    """G2 device ops (Jacobian over Fq2) for a pairing curve, or over Fq for
    bw6_761 whose G2 lives in the base field."""
    from ..ec.curve import g2_group
    from ..fields.jfield2 import field_ops2

    key = ("g2", curve)
    if key not in _CURVE_OPS:
        if curve == "bw6_761":
            from ..fields.jfield import field_ops

            grp = g2_group(curve)
            _CURVE_OPS[key] = CurveOps(field_ops(grp.q), key)
        else:
            grp = g2_group(curve)
            _CURVE_OPS[key] = CurveOps(field_ops2(grp.q, grp.tower.beta), key)
    return _CURVE_OPS[key]
