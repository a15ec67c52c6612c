"""Multi-scalar multiplication (Pippenger) on device.

The #1 hot kernel of every prover (reference: arkworks' rayon-parallel
Pippenger inside ark-ec, pulled in by zokrates_ark). TPU-native design,
shaped by two XLA constraints — static shapes and *small graphs* (every
distinct EC-add instantiation costs compile time):

  * scalars live as base-2^16 limb arrays; window digits are bit-slices, so
    c in {1,2,4,8,16} costs no decomposition work,
  * bucket accumulation: points are split into CHUNKS rows; each row folds
    its points into a private bucket table sequentially (one `mixed_add`
    inside a fori_loop — optimal O(N) adds, CHUNKS-way data parallel,
    chunk-local scatter so there are no write conflicts),
  * chunk tables are then folded together with a masked halving loop, and
    bucket-weighted sums use the suffix-sum identity
    sum_b b*S_b = sum_k (sum_{b>=k} S_b) via a Hillis-Steele scan —
    all fixed-shape fori_loops, each instantiating a single EC add,
  * windows combine MSB-first with c doublings per step.

Sharding: split the point axis across devices, psum-reduce... see
parallel/msm_sharded.py which reuses window_sum per shard.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limbs import LIMB_BITS
from .jec import CurveOps, PointBatch


def _digit_matrix(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, nl) uint32 scalar limbs -> (W, N) digits for window size c bits.

    c must divide LIMB_BITS. Window 0 is least significant.
    """
    assert LIMB_BITS % c == 0, f"window size {c} must divide {LIMB_BITS}"
    per_limb = LIMB_BITS // c
    mask = np.uint32((1 << c) - 1)
    digits = []
    nl = scalars.shape[1]
    for limb in range(nl):
        col = scalars[:, limb]
        for k in range(per_limb):
            digits.append((col >> np.uint32(k * c)) & mask)
    return jnp.stack(digits, axis=0)  # (W, N)


def _masked_halving_total(ops: CurveOps, P: PointBatch) -> PointBatch:
    """Sum a (n, ...) point batch along axis 0 with a fixed-shape loop:
    log2(n) iterations of `v[i] += v[i + n/2^l]` (single EC-add instance)."""
    X, Y, Z = P
    n = X.shape[0]
    levels = max(1, (n - 1).bit_length())
    n_pad = 1 << levels
    if n_pad != n:
        inf = ops.infinity((n_pad - n,))
        X = jnp.concatenate([X, inf[0]], axis=0)
        Y = jnp.concatenate([Y, inf[1]], axis=0)
        Z = jnp.concatenate([Z, inf[2]], axis=0)

    def body(l, carry):
        X, Y, Z = carry
        half = n_pad >> 1  # max roll; actual useful width shrinks
        shift = n_pad >> (l + 1)
        Xs = jnp.roll(X, -shift, axis=0)
        Ys = jnp.roll(Y, -shift, axis=0)
        Zs = jnp.roll(Z, -shift, axis=0)
        S = ops.add((X, Y, Z), (Xs, Ys, Zs))
        idx = jax.lax.broadcasted_iota(jnp.int32, (n_pad,), 0)
        keep = idx < shift
        X = ops.f.select(keep, S[0], X)
        Y = ops.f.select(keep, S[1], Y)
        Z = ops.f.select(keep, S[2], Z)
        return (X, Y, Z)

    X, Y, Z = jax.lax.fori_loop(0, levels, body, (X, Y, Z))
    return (X[0], Y[0], Z[0])


def _suffix_scan(ops: CurveOps, P: PointBatch) -> PointBatch:
    """Inclusive suffix sums along axis 0 (Hillis-Steele, fixed shapes)."""
    X, Y, Z = P
    n = X.shape[0]
    levels = max(1, (n - 1).bit_length())

    def body(l, carry):
        X, Y, Z = carry
        shift = 1 << l
        # v[i] += v[i + shift] when i + shift < n
        Xs = jnp.roll(X, -shift, axis=0)
        Ys = jnp.roll(Y, -shift, axis=0)
        Zs = jnp.roll(Z, -shift, axis=0)
        S = ops.add((X, Y, Z), (Xs, Ys, Zs))
        idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        valid = idx + shift < n
        X = ops.f.select(valid, S[0], X)
        Y = ops.f.select(valid, S[1], Y)
        Z = ops.f.select(valid, S[2], Z)
        return (X, Y, Z)

    return jax.lax.fori_loop(0, levels, body, (X, Y, Z))


def _bucket_accumulate(
    ops: CurveOps,
    digits: jnp.ndarray,  # (chunks, chunk_len) uint32
    Px: jnp.ndarray,      # (chunks, chunk_len, ...) affine coords
    Py: jnp.ndarray,
    n_buckets: int,
) -> PointBatch:
    """Per-chunk sequential fold into private bucket tables, then fold the
    chunk axis. Returns (n_buckets, ...) bucket sums (slot 0 = garbage)."""
    chunks = digits.shape[0]
    chunk_len = digits.shape[1]
    buckets = ops.infinity((chunks, n_buckets))
    rows = jnp.arange(chunks)

    def body(t, bk):
        bX, bY, bZ = bk
        d = digits[:, t]
        qx = Px[:, t]
        qy = Py[:, t]
        cur = (bX[rows, d], bY[rows, d], bZ[rows, d])
        new = ops.mixed_add(cur, qx, qy)
        return (
            bX.at[rows, d].set(new[0]),
            bY.at[rows, d].set(new[1]),
            bZ.at[rows, d].set(new[2]),
        )

    buckets = jax.lax.fori_loop(0, chunk_len, body, buckets)

    # fold chunk tables: (chunks, n_buckets) -> (n_buckets,)
    levels = max(1, (chunks - 1).bit_length())
    assert chunks == (1 << levels) or chunks == 1, "chunks must be a power of two"

    def fold(l, bk):
        bX, bY, bZ = bk
        shift = chunks >> (l + 1)
        S = ops.add(
            (bX, bY, bZ),
            (
                jnp.roll(bX, -shift, axis=0),
                jnp.roll(bY, -shift, axis=0),
                jnp.roll(bZ, -shift, axis=0),
            ),
        )
        idx = jax.lax.broadcasted_iota(jnp.int32, (chunks,), 0)
        keep = (idx < shift)[:, None]
        return (
            ops.f.select(keep, S[0], bX),
            ops.f.select(keep, S[1], bY),
            ops.f.select(keep, S[2], bZ),
        )

    if chunks > 1:
        buckets = jax.lax.fori_loop(0, levels, fold, buckets)
    return (buckets[0][0], buckets[1][0], buckets[2][0])


def window_sum(ops: CurveOps, digits, Px, Py, n_buckets: int) -> PointBatch:
    """One Pippenger window: bucket accumulation + weighted reduce."""
    buckets = _bucket_accumulate(ops, digits, Px, Py, n_buckets)
    tail = (buckets[0][1:], buckets[1][1:], buckets[2][1:])
    suff = _suffix_scan(ops, tail)
    return _masked_halving_total(ops, suff)


def _pick_chunks(n: int, n_buckets: int) -> int:
    """Data-parallel width: keep the sequential fold >= 16 steps, cap the
    width so the per-chunk bucket tables fit HBM (chunks * n_buckets point
    slots; 2^22 slots ~ 0.8 GB at 16 limbs)."""
    mem_cap = max(1, (1 << 22) // n_buckets)
    cap = min(8192, mem_cap)
    c = 1
    while c * 16 <= n and c < cap:
        c *= 2
    return c


def msm(
    ops: CurveOps,
    Px: jnp.ndarray,
    Py: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int = 8,
    chunks: Optional[int] = None,
) -> PointBatch:
    """MSM over affine points (coords as (N, ...) Montgomery limb arrays) and
    canonical (non-Montgomery) scalar limbs (N, nl_scalar). Returns a single
    Jacobian point.

    Zero scalars land in bucket 0, which is dropped — so padding with
    (arbitrary point, zero scalar) is harmless, which is also how the input
    is padded to chunks*chunk_len.
    """
    N = Px.shape[0]
    digits = _digit_matrix(scalars, c)  # (W, N)
    n_windows = digits.shape[0]
    n_buckets = 1 << c

    chunks = chunks or _pick_chunks(N, n_buckets)
    chunk_len = -(-N // chunks)
    pad = chunks * chunk_len - N
    if pad:
        digits = jnp.pad(digits, ((0, 0), (0, pad)))  # zero digits -> dropped
        padp = [(0, pad)] + [(0, 0)] * (Px.ndim - 1)
        Px = jnp.pad(Px, padp, mode="edge")
        Py = jnp.pad(Py, padp, mode="edge")

    digits = digits.reshape(n_windows, chunks, chunk_len)
    Px = Px.reshape((chunks, chunk_len) + Px.shape[1:])
    Py = Py.reshape((chunks, chunk_len) + Py.shape[1:])

    def one_window(d):
        return window_sum(ops, d, Px, Py, n_buckets)

    wx, wy, wz = jax.lax.map(one_window, digits)

    # combine windows MSB-first: acc = 2^c * acc + W_w
    def body(w, acc):
        def dbl(_, a):
            return ops.double(a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        i = n_windows - 1 - w
        wpt = (wx[i], wy[i], wz[i])
        a = (acc[0][None], acc[1][None], acc[2][None])
        b = (wpt[0][None], wpt[1][None], wpt[2][None])
        s = ops.add(a, b)
        return (s[0][0], s[1][0], s[2][0])

    acc = jax.lax.fori_loop(0, n_windows, body, ops.infinity(()))
    return acc


_MSM_JIT = {}


def msm_jit(ops: CurveOps, c: int):
    """Cached jitted MSM for (curve, window) — avoids per-call retraces."""
    key = (ops.key, c)
    if key not in _MSM_JIT:
        _MSM_JIT[key] = jax.jit(partial(msm, ops, c=c))
    return _MSM_JIT[key]


def msm_host(ops: CurveOps, points, scalar_ints, c: int = 8):
    """Convenience wrapper: host affine PointG1 list + int scalars -> host PointG1."""
    from ..ec.curve import PointG1
    from ..fields.limbs import ints_to_limbs, n_limbs

    grp = points[0].curve
    xs = [p.x for p in points]
    ys = [p.y for p in points]
    Px = ops.f.encode(xs)
    Py = ops.f.encode(ys)
    nls = n_limbs(grp.r)
    S = jnp.asarray(ints_to_limbs([s % grp.r for s in scalar_ints], nls))
    res = msm_jit(ops, c)(Px, Py, S)
    aff = ops.to_affine_ints((res[0][None], res[1][None], res[2][None]))[0]
    if aff is None:
        return PointG1(grp, None, None)
    return PointG1(grp, aff[0], aff[1])


# ---------------------------------------------------------------------------
# Batched-window MSM: all Pippenger windows ride one accumulation loop, and
# the final window combine (a few hundred inherently-sequential doublings)
# happens on the host where it costs microseconds. This keeps the number of
# sequential device steps at ~chunk_len + log2(chunks) + c instead of
# W * (that), which matters because each device step of narrow EC math is
# latency- not throughput-bound.
# ---------------------------------------------------------------------------


def msm_window_sums(
    ops: CurveOps,
    Px: jnp.ndarray,
    Py: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int = 8,
    chunks: Optional[int] = None,
) -> PointBatch:
    """Per-window Pippenger sums: returns (W, ...) Jacobian points, window 0
    least significant.

    Layout note: the (window, chunk) pair is flattened into one leading axis
    (chunk-major) so the bucket scatter stays 2-D — the multi-axis batched
    scatter form compiles pathologically slowly on the TPU toolchain.
    """
    N = Px.shape[0]
    digits = _digit_matrix(scalars, c)  # (W, N)
    W = digits.shape[0]
    n_buckets = 1 << c

    chunks = chunks or _pick_chunks(N, n_buckets * W)
    chunk_len = -(-N // chunks)
    pad = chunks * chunk_len - N
    if pad:
        digits = jnp.pad(digits, ((0, 0), (0, pad)))
        padp = [(0, pad)] + [(0, 0)] * (Px.ndim - 1)
        Px = jnp.pad(Px, padp, mode="edge")
        Py = jnp.pad(Py, padp, mode="edge")

    # (W, chunks, chunk_len) -> chunk-major flat rows (chunks*W, chunk_len)
    digits = jnp.moveaxis(digits.reshape(W, chunks, chunk_len), 0, 1).reshape(
        chunks * W, chunk_len
    )
    Px = Px.reshape((chunks, chunk_len) + Px.shape[1:])
    Py = Py.reshape((chunks, chunk_len) + Py.shape[1:])
    coord_shape = Px.shape[2:]

    R = chunks * W
    buckets = ops.infinity((R, n_buckets))
    rows = jnp.arange(R)

    def body(t, bk):
        bX, bY, bZ = bk
        d = digits[:, t]
        qx = jnp.broadcast_to(
            Px[:, t][:, None], (chunks, W) + coord_shape
        ).reshape((R,) + coord_shape)
        qy = jnp.broadcast_to(
            Py[:, t][:, None], (chunks, W) + coord_shape
        ).reshape((R,) + coord_shape)
        cur = (bX[rows, d], bY[rows, d], bZ[rows, d])
        new = ops.mixed_add(cur, qx, qy)
        return (
            bX.at[rows, d].set(new[0]),
            bY.at[rows, d].set(new[1]),
            bZ.at[rows, d].set(new[2]),
        )

    buckets = jax.lax.fori_loop(0, chunk_len, body, buckets)

    # fold the chunk axis: (chunks, W, B) -> (W, B)
    bX = buckets[0].reshape((chunks, W, n_buckets) + coord_shape)
    bY = buckets[1].reshape((chunks, W, n_buckets) + coord_shape)
    bZ = buckets[2].reshape((chunks, W, n_buckets) + coord_shape)
    levels = max(1, (chunks - 1).bit_length())
    assert chunks == (1 << levels) or chunks == 1

    def fold(l, bk):
        X, Y, Z = bk
        shift = chunks >> (l + 1)
        S = ops.add(
            (X, Y, Z),
            (
                jnp.roll(X, -shift, axis=0),
                jnp.roll(Y, -shift, axis=0),
                jnp.roll(Z, -shift, axis=0),
            ),
        )
        idx = jax.lax.broadcasted_iota(jnp.int32, (chunks, 1, 1), 0)
        keep = idx < shift
        return (
            jnp.where(_expand(keep, S[0].ndim), S[0], X),
            jnp.where(_expand(keep, S[1].ndim), S[1], Y),
            jnp.where(_expand(keep, S[2].ndim), S[2], Z),
        )

    if chunks > 1:
        bX, bY, bZ = jax.lax.fori_loop(0, levels, fold, (bX, bY, bZ))
    bX, bY, bZ = bX[0], bY[0], bZ[0]  # (W, B)

    # weighted bucket reduce per window: suffix sums over buckets 1..B-1
    tX, tY, tZ = bX[:, 1:], bY[:, 1:], bZ[:, 1:]
    nb = n_buckets - 1
    slevels = max(1, (nb - 1).bit_length())

    def suffix(l, bk):
        X, Y, Z = bk
        shift = 1 << l
        S = ops.add(
            (X, Y, Z),
            (
                jnp.roll(X, -shift, axis=1),
                jnp.roll(Y, -shift, axis=1),
                jnp.roll(Z, -shift, axis=1),
            ),
        )
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
        valid = idx + shift < nb
        return (
            jnp.where(_expand(valid, S[0].ndim), S[0], X),
            jnp.where(_expand(valid, S[1].ndim), S[1], Y),
            jnp.where(_expand(valid, S[2].ndim), S[2], Z),
        )

    tX, tY, tZ = jax.lax.fori_loop(0, slevels, suffix, (tX, tY, tZ))

    # total of the suffix sums per window: pad the bucket axis to a power of
    # two with infinity so the halving reduce never wraps
    np2 = 1 << slevels
    if np2 != nb:
        inf = ops.infinity((W, np2 - nb))
        tX = jnp.concatenate([tX, inf[0]], axis=1)
        tY = jnp.concatenate([tY, inf[1]], axis=1)
        tZ = jnp.concatenate([tZ, inf[2]], axis=1)

    def halve(l, bk):
        X, Y, Z = bk
        shift = np2 >> (l + 1)
        S = ops.add(
            (X, Y, Z),
            (
                jnp.roll(X, -shift, axis=1),
                jnp.roll(Y, -shift, axis=1),
                jnp.roll(Z, -shift, axis=1),
            ),
        )
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, np2, 1), 1)
        keep = idx < shift
        return (
            jnp.where(_expand(keep, S[0].ndim), S[0], X),
            jnp.where(_expand(keep, S[1].ndim), S[1], Y),
            jnp.where(_expand(keep, S[2].ndim), S[2], Z),
        )

    tX, tY, tZ = jax.lax.fori_loop(0, slevels, halve, (tX, tY, tZ))
    return (tX[:, 0], tY[:, 0], tZ[:, 0])  # (W, ...)


def _expand(mask, ndim):
    while mask.ndim < ndim:
        mask = mask[..., None]
    return mask


def combine_window_sums(grp, window_points, c: int):
    """Host combine: sum_w 2^(c*w) * P_w over decoded affine window sums."""
    from ..ec.curve import PointG1

    acc = grp.zero()
    for aff in reversed(window_points):
        for _ in range(c):
            acc = acc + acc
        if aff is not None:
            acc = acc + PointG1(grp, aff[0], aff[1])
    return acc


_MSM_WS_JIT = {}


def msm_ws_jit(ops: CurveOps, c: int):
    key = (ops.key, c)
    if key not in _MSM_WS_JIT:
        _MSM_WS_JIT[key] = jax.jit(partial(msm_window_sums, ops, c=c))
    return _MSM_WS_JIT[key]
