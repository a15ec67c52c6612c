"""Host wrapper for the whole-MSM Pallas kernel (TPU hot path).

Orchestration: ONE jitted device graph does digit decomposition, the
chunk-contiguous layout, the Pippenger accumulation kernel (with its
in-kernel weighted bucket reduction — kernels/pallas_field.
msm_accumulate_factory) and the Montgomery decode, so the per-call work
outside that graph is a single small transfer plus O(W * CH) host bigint
folds. (Anything dispatched op-by-op through the axon backend pays ~1.3 ms
per HLO op, which is why digits/decode must live inside the graph: they
were 1.3 s of a 1.4 s call when dispatched eagerly.)

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
GROUP = 4       # points folded per kernel grid step


def _tier(T: int) -> int:
    t = 64
    while t < T:
        t *= 2
    return t


def _msm_core(curve_q: int, c: int, n_chunks: int, G: int, with_double: bool, S, Px, Py):
    """Jitted device graph: digits + layout + kernel + Montgomery decode."""
    f = field_ops(curve_q)
    digits = _digit_matrix(S, c)
    W = digits.shape[0]
    lanes = W * n_chunks
    N = Px.shape[0]
    T = N // n_chunks
    TG = T // G
    nl = Px.shape[1]
    D = jnp.transpose(digits.reshape(W, n_chunks, T), (2, 0, 1)).reshape(T, 1, lanes)
    D = D.reshape(TG, 1, G, lanes)
    Qx = jnp.transpose(Px.reshape(n_chunks, T, nl), (1, 2, 0))
    Qy = jnp.transpose(Py.reshape(n_chunks, T, nl), (1, 2, 0))
    Qx = Qx.reshape(TG, G, nl, n_chunks).transpose(0, 2, 1, 3).reshape(TG, nl, G * n_chunks)
    Qy = Qy.reshape(TG, G, nl, n_chunks).transpose(0, 2, 1, 3).reshape(TG, nl, G * n_chunks)
    wsum, flag = msm_pallas_window_sums(
        curve_q, D, Qx, Qy, 1 << c, W, n_chunks, G, with_double=with_double
    )
    rows = jnp.transpose(wsum, (0, 2, 1)).reshape(3 * lanes, nl)
    return f.from_mont_(rows), jnp.max(flag)


_CORE_JIT = {}


def msm_pallas(
    curve_q: int,
    curve_r: int,
    Px,
    Py,
    scalars,
    c: int = WINDOW_C,
    n_chunks: int = N_CHUNKS,
    G: int = GROUP,
):
    """Returns per-window Jacobian sums as host int lists (Xs, Ys, Zs):
    device bucket accumulation + reduction, host chunk fold."""
    f = field_ops(curve_q)
    N = Px.shape[0]
    T = _tier(-(-N // n_chunks))
    while T % G:
        T *= 2
    Npad = T * n_chunks
    if Npad != N:
        scalars = jnp.pad(scalars, ((0, Npad - N), (0, 0)))
        Px = jnp.pad(Px, ((0, Npad - N), (0, 0)), mode="edge")
        Py = jnp.pad(Py, ((0, Npad - N), (0, 0)), mode="edge")

    key = (curve_q, c, n_chunks, G, Npad, False)
    if key not in _CORE_JIT:
        _CORE_JIT[key] = jax.jit(partial(_msm_core, curve_q, c, n_chunks, G, False))
    rows, flag = _CORE_JIT[key](scalars, Px, Py)
    if int(flag):
        # bucket == point collision: the fast kernel skipped a doubling.
        # Rerun with the complete kernel (compiled lazily; essentially
        # never reached for the distinct-point MSMs the provers issue).
        skey = (curve_q, c, n_chunks, G, Npad, True)
        if skey not in _CORE_JIT:
            _CORE_JIT[skey] = jax.jit(partial(_msm_core, curve_q, c, n_chunks, G, True))
        rows, _ = _CORE_JIT[skey](scalars, Px, Py)
    vals = f.decode(rows, mont=False)  # length 3*lanes, order (coord, lane)

    q = curve_q
    W = len(vals) // (3 * n_chunks)
    lanes = W * n_chunks

    def at(coord, lane):
        return vals[coord * lanes + lane]

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
        acc = (1, 1, 0)
        for ch in range(n_chunks):
            lane = w * n_chunks + ch
            acc = jac_add(acc, (at(0, lane), at(1, lane), at(2, lane)))
        Xs.append(acc[0])
        Ys.append(acc[1])
        Zs.append(acc[2])
    return Xs, Ys, Zs


def msm_pallas_host(grp, points: Sequence[PointG1], scalar_ints: Sequence[int], c: int = WINDOW_C):
    """Full MSM: host points/scalars -> host PointG1 (TPU Pallas core)."""
    f = field_ops(grp.q)
    Px = f.encode([p.x for p in points])
    Py = f.encode([p.y for p in points])
    S = jnp.asarray(ints_to_limbs([s % grp.r for s in scalar_ints], n_limbs(grp.r)))
    Xs, Ys, Zs = msm_pallas(grp.q, grp.r, Px, Py, S)
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
