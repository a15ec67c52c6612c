"""Host wrapper for the whole-MSM Pallas kernel (TPU hot path).

Orchestration: lay the points out chunk-contiguously, hand the Pippenger
core to one pallas_call (kernels/pallas_field.msm_pallas_window_sums), pull
back W Jacobian window sums, and finish with the tiny host-side combine
(Jacobian -> affine + W*c doublings in Python ints).

The Mosaic kernel takes minutes to build, so N is padded up to power-of-two
step tiers — one compile serves every circuit in the tier (padding points
carry digit 0, which the kernel ignores).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ec.curve import PointG1, g1_group
from ..fields.jfield import field_ops, field_spec
from ..fields.limbs import ints_to_limbs, n_limbs
from .msm import _digit_matrix, combine_window_sums
from .pallas_field import msm_pallas_window_sums

WINDOW_C = 4
N_CHUNKS = 8


def _tier(T: int) -> int:
    t = 64
    while t < T:
        t *= 2
    return t


def _msm_core(curve_q: int, c: int, n_chunks: int, digits, Px, Py):
    """Jitted device part: layout + accumulation kernel -> bucket tables."""
    W = digits.shape[0]
    lanes = W * n_chunks
    N = Px.shape[0]
    T = N // n_chunks
    nl = Px.shape[1]
    D = jnp.transpose(digits.reshape(W, n_chunks, T), (2, 0, 1)).reshape(T, 1, lanes)
    Qx = jnp.transpose(Px.reshape(n_chunks, T, nl), (1, 2, 0))
    Qy = jnp.transpose(Py.reshape(n_chunks, T, nl), (1, 2, 0))
    tables = msm_pallas_window_sums(curve_q, D, Qx, Qy, 1 << c, W, n_chunks)
    # (B, 3, nl, lanes) -> (B * 3 * lanes, nl) rows for one batched decode
    B = tables.shape[0]
    return jnp.transpose(tables, (0, 1, 3, 2)).reshape(B * 3 * lanes, nl)


_CORE_JIT = {}


def msm_pallas(
    curve_q: int,
    curve_r: int,
    Px,
    Py,
    scalars,
    c: int = WINDOW_C,
    n_chunks: int = N_CHUNKS,
):
    """Returns per-window Jacobian sums as host int lists (Xs, Ys, Zs):
    device bucket accumulation + host bucket fold/weighting."""
    f = field_ops(curve_q)
    N = Px.shape[0]
    T = _tier(-(-N // n_chunks))
    Npad = T * n_chunks
    digits = _digit_matrix(scalars, c)
    W = digits.shape[0]
    B = 1 << c
    lanes = W * n_chunks
    if Npad != N:
        digits = jnp.pad(digits, ((0, 0), (0, Npad - N)))
        Px = jnp.pad(Px, ((0, Npad - N), (0, 0)), mode="edge")
        Py = jnp.pad(Py, ((0, Npad - N), (0, 0)), mode="edge")

    key = (curve_q, c, n_chunks, Npad)
    if key not in _CORE_JIT:
        _CORE_JIT[key] = jax.jit(partial(_msm_core, curve_q, c, n_chunks))
    rows = _CORE_JIT[key](digits, Px, Py)
    vals = f.decode(rows)  # length B*3*lanes, order (b, coord, lane)

    q = curve_q

    def at(b, coord, lane):
        return vals[(b * 3 + coord) * lanes + lane]

    def jac_add(P1, P2):
        # host Jacobian add (complete)
        X1, Y1, Z1 = P1
        X2, Y2, Z2 = P2
        if Z1 == 0:
            return P2
        if Z2 == 0:
            return P1
        Z1Z1 = Z1 * Z1 % q
        Z2Z2 = Z2 * Z2 % q
        U1 = X1 * Z2Z2 % q
        U2 = X2 * Z1Z1 % q
        S1 = Y1 * Z2 % q * Z2Z2 % q
        S2 = Y2 * Z1 % q * Z1Z1 % q
        if U1 == U2:
            if (S1 + S2) % q == 0:
                return (1, 1, 0)
            # double
            A = X1 * X1 % q
            Bv = Y1 * Y1 % q
            C = Bv * Bv % q
            D = 2 * ((X1 + Bv) * (X1 + Bv) - A - C) % q
            E = 3 * A % q
            Fv = E * E % q
            X3 = (Fv - 2 * D) % q
            Y3 = (E * (D - X3) - 8 * C) % q
            Z3 = 2 * Y1 * Z1 % q
            return (X3, Y3, Z3)
        H = (U2 - U1) % q
        R = (S2 - S1) % q
        H2 = 2 * H % q
        I = H2 * H2 % q
        J = H * I % q
        V = U1 * I % q
        R2 = 2 * R % q
        X3 = (R2 * R2 - J - 2 * V) % q
        Y3 = (R2 * (V - X3) - 2 * S1 * J) % q
        Z3 = ((Z1 + Z2) * (Z1 + Z2) - Z1Z1 - Z2Z2) % q * H % q
        return (X3, Y3, Z3)

    Xs, Ys, Zs = [], [], []
    for w in range(W):
        # fold chunks and weight buckets: sum_b b * S_b via suffix sums
        acc = (1, 1, 0)
        wsum = (1, 1, 0)
        for b in range(B - 1, 0, -1):
            Sb = (1, 1, 0)
            for ch in range(n_chunks):
                lane = w * n_chunks + ch
                Sb = jac_add(Sb, (at(b, 0, lane), at(b, 1, lane), at(b, 2, lane)))
            acc = jac_add(acc, Sb)
            wsum = jac_add(wsum, acc)
        Xs.append(wsum[0])
        Ys.append(wsum[1])
        Zs.append(wsum[2])
    return Xs, Ys, Zs


def msm_pallas_host(grp, points: Sequence[PointG1], scalar_ints: Sequence[int], c: int = WINDOW_C):
    """Full MSM: host points/scalars -> host PointG1 (TPU Pallas core)."""
    f = field_ops(grp.q)
    Px = f.encode([p.x for p in points])
    Py = f.encode([p.y for p in points])
    S = jnp.asarray(ints_to_limbs([s % grp.r for s in scalar_ints], n_limbs(grp.r)))
    Xs, Ys, Zs = msm_pallas(grp.q, grp.r, Px, Py, S, c=c)
    affs = []
    q = grp.q
    for x, y, z in zip(Xs, Ys, Zs):
        if z == 0:
            affs.append(None)
            continue
        zinv = pow(z, -1, q)
        zi2 = zinv * zinv % q
        affs.append((x * zi2 % q, y * zi2 % q * zinv % q))
    return combine_window_sums(grp, affs, c)
