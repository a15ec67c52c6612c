"""Sort-based large-window Pippenger MSM for TPU.

This is the round-2 redesign of the MSM hot kernel (reference: arkworks'
rayon Pippenger, zokrates_ark/Cargo.toml:6-17). The round-1 kernel used
c=4 windows with one-hot VMEM bucket tables, whose cost is O(2^c) vector
ops per point — a ~1-2M pts/s ceiling. Measured TPU primitives
(exp/m*_probe.py) show the true budget: ~45M 1024-lane mixed-adds/s
(compute-bound, flat in lane width), 512-byte-row gathers at ~7ns/row,
(16, 2^20) u32 sorts in ~18ms. That dictates this design:

  * signed digits with c = 16 = LIMB_BITS (digit == scalar limb), so a
    254-bit scalar costs 16 window-adds/point instead of 64,
  * per window: sort point indices by |digit| (jax.lax.sort), gather the
    affine points into sorted order as 512B rows (the measured-fast row
    width), then
  * bucket accumulation as a *chunked sequential walk*: lane m owns the
    contiguous sorted positions [m*K, (m+1)*K) and adds them into a
    running accumulator, flushing a partial-sum record whenever the
    bucket id changes (flags precomputed in XLA — the kernel has zero
    data-dependent addressing),
  * records (<= HB + M per window) are compacted by gather and merged by
    two more walk passes with complete adds (record counts per bucket
    provably reach <= 2), scattered into a 2-slot dense table,
  * the weighted bucket reduction sum_b b*S_b runs as a chunked suffix
    walk (2 complete adds per bucket) with a static per-lane multiplier
    ladder and an in-kernel cross-lane tree merge,
  * the final W window sums are combined on the host (W*c doublings of
    bigint math — microseconds).

Safety: the accumulation walk uses the doubling-free fast mixed-add and
raises a collision flag if any bucket-partial-sum ever equals the
incoming point (probability ~2^-127 per add for non-degenerate inputs);
the caller reruns with the complete-formula kernel in that case.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.jfield import field_spec
from ..fields.limbs import LIMB_BITS, ints_to_limbs, n_limbs
from .pallas_field import _F, _general_add, _join, _mixed_add_inline, _split, field_for


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MSMConfig:
    """Static shape/layout parameters for one MSM instantiation.

    c must divide LIMB_BITS. M1 is the accumulation-walk lane count (must
    divide the padded point count), R the points per grid step, lw2 the
    lanes-per-window of the record-merge and suffix walks.
    """

    c: int = 16
    M1: int = 1024
    R: int = 4
    lw2: int = 64
    interpret: bool = False

    @property
    def hb(self) -> int:
        return 1 << (self.c - 1)


def default_config(n: int, interpret: bool = False) -> MSMConfig:
    if interpret or n <= (1 << 12):
        return MSMConfig(c=8, M1=32, R=2, lw2=8, interpret=interpret)
    # lw2=128 keeps the whole suffix epilogue in-kernel (fold=True); the
    # lw2=64 XLA epilogue costs ~20 extra EC-add programs of compile and
    # hundreds of ms of While-loop dispatch per call (round-3 timings).
    # c=16 halves the walk adds but costs a 2^15-bucket dense table
    # (~200 ms of fixed sort/scatter/suffix work per MSM) — only worth it
    # once the walk itself dominates, i.e. n >= ~2^18. Below that c=8
    # keeps the bucket table (2^7) and merge caps tiny.
    if n <= (1 << 17):
        return MSMConfig(c=8, M1=1024, R=4, lw2=128, interpret=False)
    return MSMConfig(c=16, M1=1024, R=4, lw2=128, interpret=False)


def _windows(r_mod: int, c: int) -> int:
    """Window count for scalars < r_mod with c-bit signed digits (the
    carry out of the top window must be representable)."""
    bits = (r_mod - 1).bit_length()
    w = -(-bits // c)
    top = (r_mod - 1) >> (c * (w - 1))
    if top + 1 >= (1 << (c - 1)):
        w += 1
    return w


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _tail_of(M: int):
    """Trailing block dims for M lanes: (S, 128) when M is a multiple of
    128 (3D sublane layout — exp/m12_3d.py measures ~3x the per-lane
    field-mul throughput of flat (1, M) rows), else legacy (M,) for the
    small interpret-mode configs. Lane id m == s * 128 + l throughout."""
    if M % 128 == 0 and M >= 128:
        return (M // 128, 128)
    return (M,)


def _double_inline(F, P):
    """Jacobian doubling (dbl-2009-l), valid for a=0 curves."""
    X1, Y1, Z1 = P
    A = F.mul(X1, X1)
    Bv = F.mul(Y1, Y1)
    C = F.mul(Bv, Bv)
    t = F.add(X1, Bv)
    D = F.sub(F.sub(F.mul(t, t), A), C)
    D = F.add(D, D)
    E = F.add(F.add(A, A), A)
    Fq = F.mul(E, E)
    X3 = F.sub(Fq, F.add(D, D))
    C8 = F.add(C, C)
    C8 = F.add(C8, C8)
    C8 = F.add(C8, C8)
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
    YZ = F.mul(Y1, Z1)
    Z3 = F.add(YZ, YZ)
    return X3, Y3, Z3


def walk_kernel_factory(
    p: int, R: int, M: int, T: int, mode: str, safe: bool, compact: bool = False,
    beta=None,
):
    """Chunked segmented-accumulation walk.

    Grid (T,). Step t processes R sorted positions per lane. The M lanes
    are laid out 3D as (S, 128) with S = M // 128 — limb rows fill S VPU
    sublane groups per instruction (exp/m12_3d.py: ~2-3x the per-lane
    throughput of the legacy (1, M) rows). Inputs:
      q_ref:  (R, IN_ROWS, S, 128) block — affine [x|y] rows
              (mode="mixed", IN_ROWS=2nl) or Jacobian [X|Y|Z] (3nl)
      f_ref:  (1, R, S, 128) u32 flags — bit0 flush-after, bit1 skip
    Outputs:
      o_ref:  (R, 3nl, S, 128) block — accumulator snapshot per step
              (only flush positions are read downstream)
      flag_ref: (1, S, 128) collision flags (mixed fast path only)

    Lane id m == s * 128 + l throughout.
    """
    F = field_for(p, beta, compact=compact)
    nl = F.nl
    tail = _tail_of(M)
    mixed = mode == "mixed"

    def kernel(q_ref, f_ref, o_ref, flag_ref, accx, accy, accz, coll):
        F.prep(tail)
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            z = jnp.zeros((nl,) + tail, jnp.uint32)
            accx[...] = z
            accy[...] = z
            accz[...] = z
            coll[...] = jnp.zeros((1,) + tail, jnp.uint32)

        cur = (
            _split(accx[...], nl),
            _split(accy[...], nl),
            _split(accz[...], nl),
        )
        for r in range(R):
            flg = f_ref[0, r : r + 1]  # (1, S, 128)
            Qx = [q_ref[r, i : i + 1] for i in range(nl)]
            Qy = [q_ref[r, nl + i : nl + i + 1] for i in range(nl)]
            if mixed:
                nX, nY, nZ, is_dbl = _mixed_add_inline(
                    F, cur, Qx, Qy, with_double=safe
                )
            else:
                Qz = [q_ref[r, 2 * nl + i : 2 * nl + i + 1] for i in range(nl)]
                nX, nY, nZ = _general_add(F, cur, (Qx, Qy, Qz))
            skip = (flg & np.uint32(2)) != 0
            X = F.select(skip, cur[0], nX)
            Y = F.select(skip, cur[1], nY)
            Z = F.select(skip, cur[2], nZ)
            if mixed and not safe:
                coll[...] = coll[...] | jnp.where(
                    jnp.logical_and(is_dbl, jnp.logical_not(skip)),
                    np.uint32(1),
                    np.uint32(0),
                )
            o_ref[r, 0:nl] = _join(X)
            o_ref[r, nl : 2 * nl] = _join(Y)
            o_ref[r, 2 * nl : 3 * nl] = _join(Z)
            flush = (flg & np.uint32(1)) != 0
            Z = F.select(flush, F.zero(Z[0]), Z)
            cur = (X, Y, Z)

        accx[...] = _join(cur[0])
        accy[...] = _join(cur[1])
        accz[...] = _join(cur[2])

        @pl.when(t == T - 1)
        def _():
            flag_ref[...] = coll[...]

    return kernel


@functools.lru_cache(maxsize=None)
def _walk_call(p: int, R: int, M: int, T: int, mode: str, safe: bool, interpret: bool, beta=None):
    nl = field_spec(p).nl if beta is None else 2 * field_spec(p).nl
    in_rows = 2 * nl if mode == "mixed" else 3 * nl
    tail = _tail_of(M)
    nt = len(tail)
    zt = (0,) * nt
    kernel = walk_kernel_factory(p, R, M, T, mode, safe, compact=interpret, beta=beta)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (R, in_rows) + tail, lambda t: (t, 0) + zt, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, R) + tail, lambda t: (t, 0) + zt, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (R, 3 * nl) + tail, lambda t: (t, 0) + zt, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1,) + tail, lambda t: (0,) + zt, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T * R, 3 * nl) + tail, jnp.uint32),
            jax.ShapeDtypeStruct((1,) + tail, jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((nl,) + tail, jnp.uint32)] * 3
        + [pltpu.VMEM((1,) + tail, jnp.uint32)],
        interpret=interpret,
    )


def _suffix_sb(M: int, nl: int, lw: int) -> int:
    """Sublane-block rows per suffix grid step. The fold epilogue's Mosaic
    stack frame scales with nl * S_blk * 128: at S_blk=32, Fq2 (nl=16)
    needs ~18 MB — over the 16 MB scoped-vmem budget (the BENCH_r02-class
    fault). With lw2=128 each sublane row is one full window, so blocking
    the S axis is exact; 8 rows keeps every config under ~5 MB. Blocking
    requires whole windows per block: lw % 128 != 0 (small configs whose
    windows straddle sublane rows) disables it — those tails are tiny
    (S <= 2) and fit unblocked."""
    tail = _tail_of(M)
    if len(tail) != 2 or lw % 128 != 0:
        return 0  # legacy 1D layout / sub-row windows: no blocking
    S = tail[0]
    g = lw // 128
    # sb must divide S (grid coverage) and be a multiple of g (whole
    # windows per block); largest such <= 8 keeps the frame small
    for cand in range(min(S, 8), 0, -1):
        if S % cand == 0 and cand % g == 0:
            return cand
    return 0


def suffix_kernel_factory(
    p: int, L: int, lw: int, M: int, compact: bool = False, fold: bool = False,
    beta=None,
):
    """Chunked suffix accumulation over the 2-slot dense bucket tables.

    Input: two (L, 3nl, M) streams (slot 0 / slot 1). Each lane owns L
    consecutive table entries in *descending* bucket order; lanes
    [w*lw, (w+1)*lw) cover window w. Per step the kernel folds both slots
    into a running sum `acc` and a sum-of-running-sums `tot` (the suffix
    identity: sum_b b*S_b over a lane's chunk = tot, up to the per-lane
    base multiplier (lw-1-(lane%lw))*L).

    fold=False (legacy / interpret path): output (6nl, M) = [acc | tot];
    the weighted combine + tree merge run in an XLA epilogue — measured
    ~390 ms at 2^18 (jfield's While-loop EC ops are dispatch-bound).
    fold=True (requires lw % 128 == 0, 3D tail): the final grid step runs
    the multiplier ladder AND the per-window cross-lane tree reduction
    in-kernel (~500 extra field muls, single-digit ms); output (3nl, M)
    with window w's Jacobian total at [:, w*(lw//128), 0].

    3D tails are blocked over the sublane axis (grid (S//SB, L), block
    tail (SB, 128)) to bound the Mosaic stack frame — see _suffix_sb."""
    F = field_for(p, beta, compact=compact)
    nl = F.nl
    tail = _tail_of(M)
    if fold:
        assert len(tail) == 2 and lw % 128 == 0, (lw, tail)
    sb = _suffix_sb(M, nl, lw)
    if sb:
        assert (lw // 128) <= sb and sb % (lw // 128) == 0, (lw, sb)
        tail = (sb, 128)

    def kernel(a_ref, b_ref, o_ref, accx, accy, accz, totx, toty, totz):
        F.prep(tail)
        t = pl.program_id(1) if sb else pl.program_id(0)

        @pl.when(t == 0)
        def _():
            z = jnp.zeros((nl,) + tail, jnp.uint32)
            accx[...] = z
            accy[...] = z
            accz[...] = z
            totx[...] = z
            toty[...] = z
            totz[...] = z

        A = (
            [a_ref[0, i : i + 1] for i in range(nl)],
            [a_ref[0, nl + i : nl + i + 1] for i in range(nl)],
            [a_ref[0, 2 * nl + i : 2 * nl + i + 1] for i in range(nl)],
        )
        B = (
            [b_ref[0, i : i + 1] for i in range(nl)],
            [b_ref[0, nl + i : nl + i + 1] for i in range(nl)],
            [b_ref[0, 2 * nl + i : 2 * nl + i + 1] for i in range(nl)],
        )
        Tb = _general_add(F, A, B)
        acc = (
            _split(accx[...], nl),
            _split(accy[...], nl),
            _split(accz[...], nl),
        )
        acc = _general_add(F, acc, Tb)
        tot = (
            _split(totx[...], nl),
            _split(toty[...], nl),
            _split(totz[...], nl),
        )
        tot = _general_add(F, tot, acc)
        accx[...] = _join(acc[0])
        accy[...] = _join(acc[1])
        accz[...] = _join(acc[2])
        totx[...] = _join(tot[0])
        toty[...] = _join(tot[1])
        totz[...] = _join(tot[2])

        if not fold:
            @pl.when(t == L - 1)
            def _():
                o_ref[0:nl] = accx[...]
                o_ref[nl : 2 * nl] = accy[...]
                o_ref[2 * nl : 3 * nl] = accz[...]
                o_ref[3 * nl : 4 * nl] = totx[...]
                o_ref[4 * nl : 5 * nl] = toty[...]
                o_ref[5 * nl : 6 * nl] = totz[...]
            return

        @pl.when(t == L - 1)
        def _():
            # per-lane multiplier base = (lw-1 - (m % lw)) * L with the
            # GLOBAL lane id m = (g*SB + s)*128 + l under sublane blocking
            s_id = jax.lax.broadcasted_iota(jnp.uint32, (1,) + tail, 1)
            l_id = jax.lax.broadcasted_iota(jnp.uint32, (1,) + tail, 2)
            g_off = (
                pl.program_id(0).astype(jnp.uint32) * np.uint32(sb) if sb else 0
            )
            m = (g_off + s_id) * np.uint32(128) + l_id
            base = (np.uint32(lw - 1) - (m % np.uint32(lw))) * np.uint32(L)
            nbits = max(1, (lw - 1) * L).bit_length()

            # res = base * acc via bit ladder (fori_loop: one add + one
            # double in the body keeps the Mosaic program small);
            # lane_sum = tot + res
            one = _join(F.one_mont(base))
            zero = _join(F.zero(base))

            def ladder(k, carry):
                rx, ry, rz, tx, ty, tz = carry
                bit = ((base >> k.astype(jnp.uint32)) & 1) == 1
                res = (_split(rx, nl), _split(ry, nl), _split(rz, nl))
                tmp = (_split(tx, nl), _split(ty, nl), _split(tz, nl))
                cand = _general_add(F, res, tmp)
                res = (
                    F.select(bit, cand[0], res[0]),
                    F.select(bit, cand[1], res[1]),
                    F.select(bit, cand[2], res[2]),
                )
                tmp = _double_inline(F, tmp)
                return (
                    _join(res[0]), _join(res[1]), _join(res[2]),
                    _join(tmp[0]), _join(tmp[1]), _join(tmp[2]),
                )

            rx, ry, rz, _, _, _ = jax.lax.fori_loop(
                0, nbits, ladder, (one, one, zero, accx[...], accy[...], accz[...])
            )
            lane = _general_add(
                F,
                (_split(rx, nl), _split(ry, nl), _split(rz, nl)),
                (
                    _split(totx[...], nl),
                    _split(toty[...], nl),
                    _split(totz[...], nl),
                ),
            )

            # rotate-accumulate tree: after log2(128) doubling rotations
            # along the lane axis every lane holds its row's total; after
            # log2(lw/128) more along the sublane axis, row w*(lw/128)
            # lane 0 holds window w's total (rotation wrap never reaches
            # a window-start row's summands since (lw/128) | S).
            def rot_level(axis_idx, shifts):
                def body(i, carry):
                    x, y, z = carry
                    cur = (_split(x, nl), _split(y, nl), _split(z, nl))
                    sh = jnp.asarray(1, jnp.int32) << i
                    rolled = tuple(
                        [
                            pltpu.roll(r, -sh, axis_idx + 1)
                            for r in c
                        ]
                        for c in cur
                    )
                    s = _general_add(F, cur, rolled)
                    return (_join(s[0]), _join(s[1]), _join(s[2]))

                return body

            x, y, z = _join(lane[0]), _join(lane[1]), _join(lane[2])
            x, y, z = jax.lax.fori_loop(0, 7, rot_level(1, None), (x, y, z))
            gs = lw // 128
            if gs > 1:
                x, y, z = jax.lax.fori_loop(
                    0, gs.bit_length() - 1, rot_level(0, None), (x, y, z)
                )
            # store window w's sum at [:, w*(lw//128), 0]; downstream reads
            # only those slots
            o_ref[0:nl] = x
            o_ref[nl : 2 * nl] = y
            o_ref[2 * nl : 3 * nl] = z

    return kernel


@functools.lru_cache(maxsize=None)
def _suffix_call(p: int, L: int, lw: int, M: int, interpret: bool, fold: bool = False, beta=None):
    nl = field_spec(p).nl if beta is None else 2 * field_spec(p).nl
    tail = _tail_of(M)
    out_rows = 3 * nl if fold else 6 * nl
    kernel = suffix_kernel_factory(p, L, lw, M, compact=interpret, fold=fold, beta=beta)
    sb = _suffix_sb(M, nl, lw)
    if sb:
        S = tail[0]
        blk = (sb, 128)
        return pl.pallas_call(
            kernel,
            grid=(S // sb, L),
            in_specs=[
                pl.BlockSpec(
                    (1, 3 * nl) + blk,
                    lambda g, t: (t, 0, g, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 3 * nl) + blk,
                    lambda g, t: (t, 0, g, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (out_rows,) + blk, lambda g, t: (0, g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((out_rows,) + tail, jnp.uint32),
            scratch_shapes=[pltpu.VMEM((nl,) + blk, jnp.uint32)] * 6,
            interpret=interpret,
        )
    zt = (0,) * len(tail)
    return pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (1, 3 * nl) + tail, lambda t: (t, 0) + zt, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3 * nl) + tail, lambda t: (t, 0) + zt, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_rows,) + tail, lambda t: (0,) + zt, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows,) + tail, jnp.uint32),
        scratch_shapes=[pltpu.VMEM((nl,) + tail, jnp.uint32)] * 6,
        interpret=interpret,
    )


def _suffix_post(p: int, W: int, lw: int, L: int, out6, beta=None):
    """XLA epilogue: per-lane weighted combine (tot + base*acc with the
    static per-lane multiplier base = (lw-1-(lane%lw))*L) followed by the
    lw-lane tree reduction per window. Returns Jacobian (W, nl) arrays in
    the jec lane-minor layout (an extra (..., 2, nl) coordinate layout
    for Fq2 when beta is given)."""
    from .jec import CurveOps, curve_ops

    if beta is None:
        ops = curve_ops(p)
    else:
        from ..fields.jfield2 import field_ops2

        ops = CurveOps(field_ops2(p, beta % p), ("post2", p, beta))
    nlb = field_spec(p).nl
    nl = nlb if beta is None else 2 * nlb
    out6 = out6.reshape(6 * nl, -1)  # flatten (S, 128) tail -> M lanes
    M = out6.shape[1]

    def lanes(rows):  # (nl, M) limb-major -> (M, nl) / (M, 2, nl) for Fq2
        t = rows.T
        return t if beta is None else t.reshape(M, 2, nlb)

    acc = (lanes(out6[0:nl]), lanes(out6[nl : 2 * nl]), lanes(out6[2 * nl : 3 * nl]))
    tot = (
        lanes(out6[3 * nl : 4 * nl]),
        lanes(out6[4 * nl : 5 * nl]),
        lanes(out6[5 * nl : 6 * nl]),
    )
    mult = ((lw - 1) - (np.arange(M) % lw)) * L  # static ints
    nbits = max(1, int(mult.max())).bit_length()
    res = ops.infinity((M,))
    tmp = acc
    for k in range(nbits):
        bit = jnp.asarray((mult >> k) & 1, dtype=bool)
        res = ops.select(bit, ops.add(res, tmp), res)
        if k + 1 < nbits:
            tmp = ops.double(tmp)
    lane_sum = ops.add(tot, res)
    # tree-reduce lw lanes per window
    csh = (nl,) if beta is None else (2, nlb)
    P = tuple(a.reshape((W, lw) + csh) for a in lane_sum)
    s = lw
    while s > 1:
        s //= 2
        left = tuple(a[:, :s] for a in P)
        right = tuple(a[:, s : 2 * s] for a in P)
        P = ops.add(left, right)
    # flatten back to the kernel row layout (W, nl_eff)
    return tuple(a.reshape(W, nl) for a in P)


# ---------------------------------------------------------------------------
# XLA orchestration
# ---------------------------------------------------------------------------


def _signed_digits(scalars: jnp.ndarray, W: int, c: int):
    """(N, nls) canonical u32 16-bit-limb scalars -> bucket ids (W, N) in
    [0, 2^(c-1)] (0 = skip) and sign bits (W, N) in {0, 1}."""
    N, nls = scalars.shape
    mask = np.uint32((1 << c) - 1)
    half = np.uint32(1 << (c - 1))
    full = np.uint32(1 << c)
    carry = jnp.zeros((N,), jnp.uint32)
    buckets, signs = [], []
    for w in range(W):
        limb = (w * c) // LIMB_BITS
        sh = np.uint32((w * c) % LIMB_BITS)
        if limb < nls:
            raw = (scalars[:, limb] >> sh) & mask
        else:
            raw = jnp.zeros((N,), jnp.uint32)
        t = raw + carry
        neg = t >= half
        b = jnp.where(neg, full - t, t)
        carry = jnp.where(neg, np.uint32(1), np.uint32(0))
        buckets.append(b)
        signs.append(neg.astype(jnp.uint32))
    return jnp.stack(buckets, axis=0), jnp.stack(signs, axis=0)


def _plan_shapes(N: int, W: int, cfg: MSMConfig):
    hb = cfg.hb
    M1, R, lw2 = cfg.M1, cfg.R, cfg.lw2
    K1 = N // M1
    assert K1 * M1 == N and K1 % R == 0, (N, M1, R)
    step = lw2 * R
    cap1 = -(-(min(N, hb + M1)) // step) * step
    # cap2 == cap1 so both merge levels share one walk executable (Mosaic
    # compiles are ~1.5 min each; the extra walked rows are microseconds)
    cap2 = cap1
    M2 = W * lw2
    K2 = cap1 // lw2
    K3 = cap2 // lw2
    L4 = hb // lw2
    M4 = W * lw2
    return dict(hb=hb, K1=K1, cap1=cap1, cap2=cap2, M2=M2, K2=K2, K3=K3, L4=L4, M4=M4)


def _compact_positions(valid: jnp.ndarray, cap: int):
    """valid (W, Ncols) bool -> (W, cap) positions of True (ascending),
    padded with positions of False entries. Cumsum-rank scatter (O(N)),
    not a sort: True j lands at its rank among Trues, False j after all
    Trues at its rank among Falses; slots >= cap are dropped."""
    Wn, Ncols = valid.shape
    v = valid.astype(jnp.int32)
    rank_t = jnp.cumsum(v, axis=1) - v                # exclusive ranks
    n_true = rank_t[:, -1:] + v[:, -1:]
    rank_f = jnp.cumsum(1 - v, axis=1) - (1 - v)
    slot = jnp.where(valid, rank_t, n_true + rank_f)
    g = jnp.broadcast_to(jnp.arange(Ncols, dtype=jnp.int32)[None], (Wn, Ncols))
    out = jnp.zeros((Wn, cap), jnp.int32)
    wi = jnp.broadcast_to(jnp.arange(Wn, dtype=jnp.int32)[:, None], (Wn, Ncols))
    return out.at[wi, slot].set(g, mode="drop")


def _walk_flags(sorted_keys: jnp.ndarray, chunk: int):
    """Flush/skip flags for a walk over per-window sorted key rows.

    sorted_keys (W, Ncols) u32, key 0 = skip. Flush when the key changes,
    at each chunk end, and at the row end."""
    Wn, Ncols = sorted_keys.shape
    nxt = jnp.concatenate(
        [sorted_keys[:, 1:], jnp.zeros((Wn, 1), jnp.uint32)], axis=1
    )
    flush = sorted_keys != nxt
    g = jnp.arange(Ncols, dtype=jnp.int32)
    chunk_end = (g % chunk) == (chunk - 1)
    flush = jnp.logical_or(flush, chunk_end[None, :])
    skip = sorted_keys == 0
    return (
        flush.astype(jnp.uint32) | (skip.astype(jnp.uint32) << 1),
        jnp.logical_and(flush, jnp.logical_not(skip)),
    )


def _to_walk(arr_rows: jnp.ndarray, M: int, K: int):
    """(M*K, width) row-major (lane-chunk-contiguous) -> (K, width, *tail)
    where lane m = s*128 + l owns positions [m*K, (m+1)*K)."""
    width = arr_rows.shape[1]
    tail = _tail_of(M)
    if len(tail) == 2:
        S = tail[0]
        return arr_rows.reshape(S, 128, K, width).transpose(2, 3, 0, 1)
    return arr_rows.reshape(M, K, width).transpose(1, 2, 0)


def _from_walk(o: jnp.ndarray):
    """Walk output (K, width, *tail) -> rows (K*M, width), row t*M+m."""
    if o.ndim == 4:
        K, width, S, _ = o.shape
        return o.transpose(0, 2, 3, 1).reshape(K * S * 128, width)
    K, width, M = o.shape
    return o.transpose(0, 2, 1).reshape(K * M, width)


def _flags_to_walk(flags_row: jnp.ndarray, M: int, K: int, R: int):
    """Per-sorted-position flags (M*K,) -> walk input (K//R, R, *tail)."""
    a = flags_row.reshape(M, K).T  # (K, M)
    tail = _tail_of(M)
    return a.reshape((K // R, R) + tail)


def _merge_level(p, recs, rbuck, W, cap_in, cap_out, lw2, R, interpret, beta=None):
    """One record-merge walk level: (W*cap_in, 3nl) rows sorted by bucket
    per window (bucket 0 = pad) -> (W*cap_out, 3nl) rows, new buckets."""
    nl = field_spec(p).nl if beta is None else 2 * field_spec(p).nl
    M2 = W * lw2
    K2 = cap_in // lw2
    walk_in = _to_walk(recs, M2, K2)
    flags2d, valid = _walk_flags(rbuck.reshape(1, W * cap_in), K2)
    flags_walk = _flags_to_walk(flags2d[0], M2, K2, R)
    call = _walk_call(p, R, M2, K2 // R, "general", True, interpret, beta)
    O, _ = call(walk_in, flags_walk)
    OT = _from_walk(O)
    # positions in per-window record space
    validw = valid.reshape(W, cap_in)
    gpos = _compact_positions(validw, cap_out)
    vtaken = jnp.take_along_axis(validw, gpos, axis=1)
    rb_w = rbuck.reshape(W, cap_in)
    new_buck = jnp.where(vtaken, jnp.take_along_axis(rb_w, gpos, axis=1), 0)
    # walk-output row for per-window record j_l: (j_l% K2)*M2 + w*lw2 + j_l//K2
    wi = jnp.arange(W, dtype=jnp.int32)[:, None]
    rows = (gpos % K2) * M2 + wi * lw2 + gpos // K2
    new_recs = jnp.take(OT, rows.reshape(-1), axis=0)
    return new_recs, new_buck.reshape(-1)


def _fold_override(cfg: MSMConfig) -> bool:
    """Resolve the suffix-epilogue choice once, host-side (never inside a
    traced function — the jit cache key must see the resolved value).

    Default: in-kernel fold on hardware, XLA epilogue under interpret
    mode. The fold kernel's cross-lane tree merge uses pltpu.roll, whose
    Pallas-interpret emulation miscomputes — the override is therefore
    HARDWARE-ONLY: under cfg.interpret the env var is ignored and the XLA
    epilogue always runs. ZOKRATES_TPU_MSM_FOLD=0 forces the XLA epilogue
    on hardware too (cross-check knob); any value other than '0'/'1'
    raises."""
    env = os.environ.get("ZOKRATES_TPU_MSM_FOLD")
    if env is not None and env not in ("0", "1"):
        raise ValueError(
            f"ZOKRATES_TPU_MSM_FOLD must be '0' or '1', got {env!r}"
        )
    if cfg.interpret:
        return False
    return env != "0"


def _msm_plan(W, N, cfg: MSMConfig, scalars, Ks: int = None):
    """Scalar-only part of the sorted MSM: signed digits, per-window sort,
    walk flags, record compaction positions and record buckets. The result
    is field- and point-independent, so MSMs over different point sets
    (Groth16's a/b1/l G1 queries and the b2 G2 query all use the witness
    vector as scalars) share one plan — the plan is ~2/3 of the per-MSM
    device time at 2^15 (the lax.sort dominates).

    Ks < N produces a SPARSE plan: the per-window sort puts bucket 0
    (zero digits, skipped) first, so every nonzero digit lives in the
    LAST nnz(w) sorted positions — if the caller guarantees
    max_w nnz(w) <= Ks (zkSNARK witnesses are mostly bits, so the host
    can count exact signed-digit nonzeros cheaply), walking only the
    last-Ks slice is exact and cuts walk/gather/merge cost by N/Ks."""
    Ks = N if Ks is None else Ks
    buckets, signs = _signed_digits(scalars, W, cfg.c)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None], (W, N))
    payload = idx | (signs << np.uint32(31))
    sb, sidx = jax.lax.sort((buckets, payload), dimension=1, num_keys=1)
    if Ks < N:
        sb = sb[:, N - Ks:]
        sidx = sidx[:, N - Ks:]
    return _plan_finish(W, cfg, sb, sidx)


def _plan_finish(W, cfg: MSMConfig, sb, sidx):
    Ks = sb.shape[1]
    sh = _plan_shapes(Ks, W, cfg)
    K1, cap1 = sh["K1"], sh["cap1"]
    flags2d, valid = _walk_flags(sb, K1)
    gpos = _compact_positions(valid, cap1)
    vtaken = jnp.take_along_axis(valid, gpos, axis=1)
    rec_buck = jnp.where(vtaken, jnp.take_along_axis(sb, gpos, axis=1), 0)
    return sidx, flags2d, gpos, rec_buck


def shared_window_count(r_mod: int, c: int = 16) -> int:
    """Window count for the shared-bucket fixed-base form (see
    _msm_plan_shared)."""
    return _windows(r_mod, c)


def _msm_plan_shared(Wc: int, N: int, cfg: MSMConfig, scalars):
    """Shared-bucket fixed-base plan: one sort over all (window, point)
    pairs.

    For FIXED bases (the Groth16 h query) the proving key can store the
    pre-shifted copies 2^(c*w) * P_j; every window's digits then scatter
    into ONE shared bucket space, so the whole W-window MSM becomes a
    single-window walk over Wc*N sorted slots — at c=16 that is 16*N
    walked positions instead of 32*N (c=8 per-window), with one suffix
    fold over 2^15 buckets (lw2=1024 keeps the fold at full lane
    occupancy) and NO window combine (the shifts live in the bases).

    scalars: (N, nls) canonical limbs. Returns a plan consumable by
    _msm_from_plan with W=1 and point array of Wc*N packed rows, where
    row w*N + j holds 2^(c*w) * P_j."""
    buckets, signs = _signed_digits(scalars, Wc, cfg.c)  # (Wc, N)
    idx = (
        jnp.arange(Wc * N, dtype=jnp.uint32).reshape(Wc, N)
    )  # global row ids w*N + j
    payload = idx | (signs << np.uint32(31))
    flat_b = buckets.reshape(1, Wc * N)
    flat_p = payload.reshape(1, Wc * N)
    sb, sidx = jax.lax.sort((flat_b, flat_p), dimension=1, num_keys=1)
    return _plan_finish(1, cfg, sb, sidx)


def _msm_plan_split(W, N, cfg: MSMConfig, scalars, w0: int, Ks: int):
    """Two-group sparse plan. Witness scalar distributions are skewed BY
    WINDOW: window 0 sees every nonzero value's low digit (dense), while
    high windows only see multi-digit values (sparse). Split: windows
    [0, w0) walk all N sorted positions; windows [w0, W) walk only the
    last Ks (the caller guarantees nnz(w) <= Ks for w >= w0 — exact host
    count, see groth16._sparse_split). Returns (dense_plan, sparse_plan),
    either None when its group is empty."""
    buckets, signs = _signed_digits(scalars, W, cfg.c)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None], (W, N))
    payload = idx | (signs << np.uint32(31))
    sb, sidx = jax.lax.sort((buckets, payload), dimension=1, num_keys=1)
    pd = _plan_finish(w0, cfg, sb[:w0], sidx[:w0]) if w0 > 0 else None
    ps = (
        _plan_finish(W - w0, cfg, sb[w0:, N - Ks:], sidx[w0:, N - Ks:])
        if w0 < W
        else None
    )
    return pd, ps


def _msm_device(p, W, N, cfg: MSMConfig, P128, scalars, safe: bool, beta=None, fold: bool = False, Ks: int = None):
    """Device part of the sorted MSM (plan + point pipeline fused)."""
    plan = _msm_plan(W, N, cfg, scalars, Ks=Ks)
    return _msm_from_plan(p, W, N, cfg, P128, plan, safe, beta=beta, fold=fold)


def _msm_from_plan(p, W, N, cfg: MSMConfig, P128, plan, safe: bool, beta=None, fold: bool = False):
    """Point part of the sorted MSM over a precomputed plan. Returns
    (window sums with window w's Jacobian total, collision flag scalar).
    The walked length Ks comes from the plan's shapes (= N for a dense
    plan, less for a sparse one — see _msm_plan)."""
    nl = field_spec(p).nl if beta is None else 2 * field_spec(p).nl
    sidx, flags2d, gpos, rec_buck = plan
    Ks = sidx.shape[1]
    sh = _plan_shapes(Ks, W, cfg)
    hb, K1, cap1, cap2 = sh["hb"], sh["K1"], sh["cap1"], sh["cap2"]
    M1, R, lw2 = cfg.M1, cfg.R, cfg.lw2
    M4, L4 = sh["M4"], sh["L4"]

    l1 = _walk_call(p, R, M1, K1 // R, "mixed", safe, cfg.interpret, beta)

    # One walk executable scanned over the window axis. An inline Python
    # loop here splats W copies of the gather + walk into the traced
    # graph, which blows XLA/Mosaic compile time to tens of minutes on
    # the TPU tunnel (and times out XLA:CPU); scan traces the body once.
    def _window_body(coll, per_w):
        sidx_w, flags_w, gpos_w = per_w
        pidx = (sidx_w & np.uint32(0x7FFFFFFF)).astype(jnp.int32)
        sign = sidx_w >> np.uint32(31)
        rows = jnp.take(P128, pidx, axis=0)  # (N, 128)
        x = rows[:, :nl]
        y = rows[:, nl : 2 * nl]
        ny = rows[:, 2 * nl : 3 * nl]
        ysel = jnp.where((sign == 1)[:, None], ny, y)
        walk_in = _to_walk(jnp.concatenate([x, ysel], axis=1), M1, K1)
        flags_walk = _flags_to_walk(flags_w, M1, K1, R)
        O1, coll_w = l1(walk_in, flags_walk)
        O1T = _from_walk(O1)
        rrows = (gpos_w % K1) * M1 + gpos_w // K1
        recs_w = jnp.take(O1T, rrows, axis=0)
        return jnp.maximum(coll, jnp.max(coll_w)), recs_w

    if cfg.interpret:
        # eager interpret mode (CPU tests): lax.scan would trace+compile
        # its body — the exact cost eager mode exists to avoid
        coll_any = jnp.zeros((), jnp.uint32)
        rec_list = []
        for w in range(W):
            coll_any, recs_w = _window_body(
                coll_any, (sidx[w], flags2d[w], gpos[w])
            )
            rec_list.append(recs_w)
        recs = jnp.concatenate(rec_list, axis=0)
    else:
        coll_any, recs_sc = jax.lax.scan(
            _window_body, jnp.zeros((), jnp.uint32), (sidx, flags2d, gpos)
        )
        recs = recs_sc.reshape(W * cap1, 3 * nl)

    # Merge until the provable per-bucket record bound reaches <= 2 (the
    # dense table is 2-slotted). After walk 1 a bucket's run spans at most
    # ceil((K1*M1-1)/K1)+1 = M1 lanes -> up to M1 records; each merge level
    # (lanes own K2 = cap/lw2 consecutive records) shrinks a run of R_b
    # records to at most ceil((R_b-1)/K2)+1. Skewed scalar distributions
    # (zkSNARK witnesses are mostly bits: bucket 1 of window 0 can hold
    # most of the points) DO reach the M1 worst case, so the level count
    # must come from the bound, not from a fixed 2 (the round-3 bug: two
    # levels left up to ~9 records per bucket on the sha256 witness and
    # the table drop corrupted window 0).
    K2 = cap1 // lw2
    assert K2 >= 2, (cap1, lw2)  # K2 == 1 would never shrink the bound
    bound = min(M1, -(-(Ks - 1) // K1) + 1)
    recs, rbuck = _merge_level(
        p, recs, rec_buck.reshape(-1), W, cap1, cap2, lw2, R, cfg.interpret, beta
    )
    bound = -(-(bound - 1) // K2) + 1
    while bound > 2:
        recs, rbuck = _merge_level(
            p, recs, rbuck, W, cap2, cap2, lw2, R, cfg.interpret, beta
        )
        bound = -(-(bound - 1) // K2) + 1

    # slotted dense table: <= 2 records per bucket after the merges.
    # Built as a u32 *index* scatter + one row gather — scattering the
    # (3nl,)-wide record rows directly costs ~4x more (TPU scatter runs
    # far below HBM bandwidth; gathers don't).
    rb_w = rbuck.reshape(W, cap2)
    prev = jnp.concatenate([jnp.zeros((W, 1), jnp.uint32), rb_w[:, :-1]], axis=1)
    slot = jnp.logical_and(rb_w == prev, rb_w != 0).astype(jnp.int32)
    wi = jnp.arange(W, dtype=jnp.int32)[:, None]
    j = jnp.arange(cap2, dtype=jnp.int32)[None, :]
    dense_pos = slot * (W * hb) + wi * hb + (hb - rb_w.astype(jnp.int32))
    dump_pos = 2 * W * hb + wi * cap2 + j  # distinct OOB slots, dropped
    pos = jnp.where(rb_w != 0, dense_pos, dump_pos).reshape(-1)
    ridx = jnp.full((2 * W * hb,), W * cap2, jnp.int32)  # default: zero row
    ridx = ridx.at[pos].set(
        jnp.arange(W * cap2, dtype=jnp.int32), mode="drop", unique_indices=True
    )
    recs_pad = jnp.concatenate(
        [recs, jnp.zeros((1, 3 * nl), jnp.uint32)], axis=0
    )
    table = jnp.take(recs_pad, ridx, axis=0)

    # Pallas sublane blocks must divide by 8: when the window count gives
    # a 3D suffix tail whose sublane axis (S = W * lw2/128) is not a
    # multiple of 8 (window-split groups like W=30 or 31), pad the table's
    # window axis with zero rows (Z=0 sums, sliced off after) so the
    # suffix walk keeps its 8-row blocking and bounded VMEM frame.
    Wp = W
    if lw2 % 128 == 0 and (W * (lw2 // 128)) % 8 != 0:
        Wp = -(-W * (lw2 // 128) // 8) * 8 // (lw2 // 128)
        t4 = table.reshape(2, W, hb, 3 * nl)
        t4 = jnp.pad(t4, ((0, 0), (0, Wp - W), (0, 0), (0, 0)))
        table = t4.reshape(2 * Wp * hb, 3 * nl)
    M4 = Wp * lw2

    A = _to_walk(table[: Wp * hb], M4, L4)
    B = _to_walk(table[Wp * hb : 2 * Wp * hb], M4, L4)
    # In-kernel fold epilogue when the layout supports it AND the caller
    # resolved fold=True (hardware only — see _fold_override); otherwise
    # the XLA epilogue (_suffix_post).
    fold = fold and lw2 % 128 == 0 and len(_tail_of(M4)) == 2
    sfx = _suffix_call(p, L4, lw2, M4, cfg.interpret, fold, beta)
    out = sfx(A, B)
    if fold:
        gs = lw2 // 128
        wX = out[0:nl, ::gs, 0].T[:W]      # (W, nl): window w at row w*gs
        wY = out[nl : 2 * nl, ::gs, 0].T[:W]
        wZ = out[2 * nl : 3 * nl, ::gs, 0].T[:W]
    else:
        wX, wY, wZ = _suffix_post(p, Wp, lw2, L4, out, beta)
        wX, wY, wZ = wX[:W], wY[:W], wZ[:W]
    return (wX, wY, wZ), coll_any


_MSM_JITS = {}


def _msm_jit(p, W, N, cfg, safe, beta=None, fold=False):
    key = (p, W, N, cfg, safe, beta, fold)
    if key not in _MSM_JITS:
        _MSM_JITS[key] = jax.jit(
            functools.partial(
                _msm_device, p, W, N, cfg, safe=safe, beta=beta, fold=fold
            )
        )
    return _MSM_JITS[key]


_PLAN_JITS = {}
_FROMPLAN_JITS = {}


def plan_jit(W, N, cfg):
    """Jitted scalars -> plan tensors (shared across same-scalar MSMs)."""
    key = (W, N, cfg)
    if key not in _PLAN_JITS:
        _PLAN_JITS[key] = jax.jit(functools.partial(_msm_plan, W, N, cfg))
    return _PLAN_JITS[key]


def msm_from_plan_jit(p, W, N, cfg, safe, beta=None, fold=False):
    """Jitted (P128, *plan) -> window sums. One executable serves every
    query of the same shape/field — the Groth16 prover runs it four times
    (a/b1/l/h) against two plans."""
    key = (p, W, N, cfg, safe, beta, fold)
    if key not in _FROMPLAN_JITS:
        def run(P128, sidx, flags2d, gpos, rec_buck,
                _p=p, _W=W, _N=N, _cfg=cfg, _safe=safe, _beta=beta, _fold=fold):
            return _msm_from_plan(
                _p, _W, _N, _cfg, P128, (sidx, flags2d, gpos, rec_buck),
                _safe, beta=_beta, fold=_fold,
            )

        _FROMPLAN_JITS[key] = jax.jit(run)
    return _FROMPLAN_JITS[key]


# ---------------------------------------------------------------------------
# Host-side combine and plan API
# ---------------------------------------------------------------------------


def _host_jac_double(p, P):
    X1, Y1, Z1 = P
    if Z1 == 0:
        return P
    A = X1 * X1 % p
    B = Y1 * Y1 % p
    C = B * B % p
    D = 2 * ((X1 + B) * (X1 + B) - A - C) % p
    E = 3 * A % p
    F = E * E % p
    X3 = (F - 2 * D) % p
    Y3 = (E * (D - X3) - 8 * C) % p
    Z3 = 2 * Y1 * Z1 % p
    return (X3, Y3, Z3)


def _host_jac_add(p, P, Q):
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    if Z1 == 0:
        return Q
    if Z2 == 0:
        return P
    Z1Z1 = Z1 * Z1 % p
    Z2Z2 = Z2 * Z2 % p
    U1 = X1 * Z2Z2 % p
    U2 = X2 * Z1Z1 % p
    S1 = Y1 * Z2 * Z2Z2 % p
    S2 = Y2 * Z1 * Z1Z1 % p
    if U1 == U2:
        if S1 == S2:
            return _host_jac_double(p, P)
        return (1, 1, 0)
    H = (U2 - U1) % p
    Rr = (S2 - S1) % p
    H2 = 2 * H % p
    I = H2 * H2 % p
    J = H * I % p
    R2 = 2 * Rr % p
    V = U1 * I % p
    X3 = (R2 * R2 - J - 2 * V) % p
    Y3 = (R2 * (V - X3) - 2 * S1 * J) % p
    Z3 = ((Z1 + Z2) * (Z1 + Z2) - Z1Z1 - Z2Z2) % p * H % p
    return (X3, Y3, Z3)


def _f2mul(p, beta, a, b):
    t0 = a[0] * b[0] % p
    t1 = a[1] * b[1] % p
    return ((t0 + beta * t1) % p, ((a[0] + a[1]) * (b[0] + b[1]) - t0 - t1) % p)


def _f2addn(p, *xs):
    c0 = sum(x[0] for x in xs) % p
    c1 = sum(x[1] for x in xs) % p
    return (c0, c1)


def _f2sub(p, a, b):
    return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)


def _f2scale(p, k, a):
    return (k * a[0] % p, k * a[1] % p)


def _host_jac_double2(p, beta, P):
    X1, Y1, Z1 = P
    if Z1 == (0, 0):
        return P
    m = lambda a, b: _f2mul(p, beta, a, b)
    A = m(X1, X1)
    B = m(Y1, Y1)
    C = m(B, B)
    t = _f2addn(p, X1, B)
    D = _f2scale(p, 2, _f2sub(p, _f2sub(p, m(t, t), A), C))
    E = _f2scale(p, 3, A)
    F = m(E, E)
    X3 = _f2sub(p, F, _f2scale(p, 2, D))
    Y3 = _f2sub(p, m(E, _f2sub(p, D, X3)), _f2scale(p, 8, C))
    Z3 = _f2scale(p, 2, m(Y1, Z1))
    return (X3, Y3, Z3)


def _host_jac_add2(p, beta, P, Q):
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    if Z1 == (0, 0):
        return Q
    if Z2 == (0, 0):
        return P
    m = lambda a, b: _f2mul(p, beta, a, b)
    Z1Z1 = m(Z1, Z1)
    Z2Z2 = m(Z2, Z2)
    U1 = m(X1, Z2Z2)
    U2 = m(X2, Z1Z1)
    S1 = m(m(Y1, Z2), Z2Z2)
    S2 = m(m(Y2, Z1), Z1Z1)
    if U1 == U2:
        if S1 == S2:
            return _host_jac_double2(p, beta, P)
        return ((1, 0), (1, 0), (0, 0))
    H = _f2sub(p, U2, U1)
    Rr = _f2sub(p, S2, S1)
    H2 = _f2scale(p, 2, H)
    I = m(H2, H2)
    J = m(H, I)
    R2 = _f2scale(p, 2, Rr)
    V = m(U1, I)
    X3 = _f2sub(p, _f2sub(p, m(R2, R2), J), _f2scale(p, 2, V))
    Y3 = _f2sub(p, m(R2, _f2sub(p, V, X3)), _f2scale(p, 2, m(S1, J)))
    Z3 = m(_f2sub(p, _f2sub(p, m(_f2addn(p, Z1, Z2), _f2addn(p, Z1, Z2)), Z1Z1), Z2Z2), H)
    return (X3, Y3, Z3)


def _limbs_to_int(row: np.ndarray) -> int:
    v = 0
    for i in range(len(row) - 1, -1, -1):
        v = (v << LIMB_BITS) | int(row[i])
    return v


def msm_sorted_host(p, r_mod, P128, scalars, cfg: MSMConfig | None = None, max_bits: int | None = None, beta=None):
    """Full sorted MSM: device pipeline + host window combine.

    P128: (N, 128) u32 packed points [x|y|negy|pad] in Montgomery limbs
    (G2 rows pack each Fq2 coordinate as [c0 limbs | c1 limbs]).
    scalars: (N, nls) u32 canonical limbs. Returns host Jacobian ints
    (X, Y, Z) with coordinates in canonical (non-Montgomery) form —
    Fq2 coordinates as (c0, c1) int pairs when beta is given.
    """
    N = P128.shape[0]
    cfg = cfg or default_config(N)
    W = _windows(r_mod, cfg.c)
    if max_bits is not None:
        W = min(W, -(-max_bits // cfg.c) + 1)
    fold = _fold_override(cfg)
    if cfg.interpret:
        # eager execution: XLA:CPU compile of the full fused graph is far
        # slower than op-by-op interpretation at test sizes
        out, coll = _msm_device(
            p, W, N, cfg, P128, scalars, safe=False, beta=beta, fold=fold
        )
    else:
        out, coll = _msm_jit(p, W, N, cfg, False, beta, fold)(P128, scalars)
    coll = int(jax.device_get(coll))
    if coll:
        if cfg.interpret:
            out, _ = _msm_device(
                p, W, N, cfg, P128, scalars, safe=True, beta=beta, fold=fold
            )
        else:
            out, _ = _msm_jit(p, W, N, cfg, True, beta, fold)(P128, scalars)
    return combine_windows(p, r_mod, jax.device_get(out), W, cfg, beta=beta)


def combine_windows(p, r_mod, wXYZ, W: int, cfg: MSMConfig, beta=None):
    """Window sums ((W, nl) Montgomery arrays) -> host Jacobian ints.

    Dispatches to the native C combine (zokrates_tpu/native) when
    available — W*c Jacobian doublings of Python bigint math cost ~1-3 ms
    per MSM, ~30 us in C. The Python loop below is the fallback and the
    cross-check oracle (tests run both)."""
    from ..native import field_for as _native_field

    nf = _native_field(p, beta)
    if nf is not None:
        wX, wY, wZ = (np.asarray(a) for a in wXYZ)
        if beta is not None:
            return nf.combine_windows2(wX[:W], wY[:W], wZ[:W], W, cfg.c)
        return nf.combine_windows(wX[:W], wY[:W], wZ[:W], W, cfg.c)
    spec = field_spec(p)
    rinv = pow(spec.r, -1, p)
    wX, wY, wZ = (np.asarray(a) for a in wXYZ)
    if beta is not None:
        nlb = spec.nl

        def dec2(row):
            return (
                _limbs_to_int(row[:nlb]) * rinv % p,
                _limbs_to_int(row[nlb:]) * rinv % p,
            )

        acc = ((1, 0), (1, 0), (0, 0))
        for w in range(W - 1, -1, -1):
            for _ in range(cfg.c):
                acc = _host_jac_double2(p, beta, acc)
            acc = _host_jac_add2(
                p, beta, acc, (dec2(wX[w]), dec2(wY[w]), dec2(wZ[w]))
            )
        return acc
    acc = (1, 1, 0)
    for w in range(W - 1, -1, -1):
        for _ in range(cfg.c):
            acc = _host_jac_double(p, acc)
        X = _limbs_to_int(wX[w]) * rinv % p
        Y = _limbs_to_int(wY[w]) * rinv % p
        Z = _limbs_to_int(wZ[w]) * rinv % p
        acc = _host_jac_add(p, acc, (X, Y, Z))
    return acc


def pack_points(p, X, Y):
    """Device mont limb arrays (N, nl) -> packed (N, 128) u32 rows
    [x|y|negy|0-pad] (the measured-fast 512-byte gather row)."""
    from ..fields.jfield import field_ops

    f = field_ops(p)
    nl = f.nl
    N = X.shape[0]
    ny = f.neg_(Y)
    pad = jnp.zeros((N, 128 - 3 * nl), jnp.uint32)
    return jnp.concatenate([X, Y, ny, pad], axis=1)


def pack_points_g2(p, X, Y):
    """Device mont limb arrays (N, 2, nl) Fq2 coords -> packed (N, 128)
    u32 rows [x.c0|x.c1|y.c0|y.c1|-y.c0|-y.c1|0-pad] (3*2nl = 96 rows)."""
    from ..fields.jfield import field_ops

    f = field_ops(p)
    nl = f.nl
    N = X.shape[0]
    ny = f.neg_(Y)
    pad = jnp.zeros((N, 128 - 6 * nl), jnp.uint32)
    return jnp.concatenate(
        [X.reshape(N, 2 * nl), Y.reshape(N, 2 * nl), ny.reshape(N, 2 * nl), pad],
        axis=1,
    )


def pad_msm_inputs(p, X, Y, scalars, min_n: int = 1 << 12):
    """Pad N to the next power-of-two tier (>= min_n). Padding scalars are
    zero (bucket 0 -> skipped)."""
    n = X.shape[0]
    N = max(min_n, 1 << (n - 1).bit_length())
    if N != n:
        zpts = jnp.zeros((N - n, X.shape[1]), jnp.uint32)
        zsc = jnp.zeros((N - n, scalars.shape[1]), jnp.uint32)
        X = jnp.concatenate([X, zpts], axis=0)
        Y = jnp.concatenate([Y, zpts], axis=0)
        scalars = jnp.concatenate([scalars, zsc], axis=0)
    return X, Y, scalars
