"""Correctness tests for the sort-based large-window MSM (kernels/msm_sorted.py).

Runs on the CPU backend with Pallas interpret mode and a reduced config
(c=8, 32 lanes). Oracle: host double-and-add over ec.curve points.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zokrates_tpu.ec.curve import g1_group
from zokrates_tpu.fields.jfield import field_ops
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
from zokrates_tpu.kernels.msm_sorted import (
    MSMConfig,
    msm_sorted_host,
    pack_points,
    pad_msm_inputs,
    _windows,
)


def _setup(curve="bn128", n=512, seed=0, scalar_bits=40, family="random"):
    grp = g1_group(curve)
    rng = np.random.default_rng(seed)
    g = grp.generator()
    # "random-looking" points: P_i = R0 + i*Q for random R0, Q
    r0 = g * int(rng.integers(1, min(grp.r, 1 << 62)))
    q = g * int(rng.integers(1, min(grp.r, 1 << 62)))
    pts = []
    acc = r0
    for _ in range(n):
        pts.append(acc)
        acc = acc + q
    hi = grp.r if scalar_bits is None else (1 << scalar_bits)
    scalars = [int(rng.integers(0, min(hi, 1 << 63))) for _ in range(n)]
    if family == "smallmult":
        pts = [g * (i + 1) for i in range(n)]
    return grp, pts, scalars


def _expected(grp, pts, scalars):
    acc = grp.zero()
    for P, s in zip(pts, scalars):
        acc = acc + P * s
    return acc


def _run(curve, grp, pts, scalars, cfg, max_bits=None):
    f = field_ops(grp.q)
    X = f.encode([p.x for p in pts])
    Y = f.encode([p.y for p in pts])
    nls = n_limbs(grp.r)
    S = jnp.asarray(ints_to_limbs([s % grp.r for s in scalars], nls))
    X, Y, S = pad_msm_inputs(grp.q, X, Y, S, min_n=cfg.M1 * cfg.R)
    P128 = pack_points(grp.q, X, Y)
    jx, jy, jz = msm_sorted_host(grp.q, grp.r, P128, S, cfg, max_bits=max_bits)
    if jz == 0:
        return grp.zero()
    zinv = pow(jz, -1, grp.q)
    return grp.point(jx * zinv * zinv % grp.q, jy * zinv * zinv % grp.q * zinv % grp.q)


CFG = MSMConfig(c=8, M1=32, R=2, lw2=8, interpret=True)


@pytest.mark.parametrize("n", [96])
def test_msm_sorted_random(n):
    grp, pts, scalars = _setup(n=n)
    got = _run("bn128", grp, pts, scalars, CFG, max_bits=40)
    exp = _expected(grp, pts, scalars)
    assert (got.x, got.y) == (exp.x, exp.y)


def test_msm_sorted_edge_scalars():
    grp, pts, scalars = _setup(n=96)
    scalars[0] = 0
    scalars[1] = (1 << 40) - 1
    scalars[2] = 1
    scalars[3] = (1 << 39) + 5
    scalars[4] = 0
    got = _run("bn128", grp, pts, scalars, CFG, max_bits=40)
    exp = _expected(grp, pts, scalars)
    assert (got.x, got.y) == (exp.x, exp.y)


def test_msm_sorted_smallmult_collisions():
    # i*g points make bucket partial sums collide with inputs, forcing the
    # safe-kernel fallback path.
    grp, pts, scalars = _setup(n=96, family="smallmult", scalar_bits=16)
    got = _run("bn128", grp, pts, scalars, CFG, max_bits=16)
    exp = _expected(grp, pts, scalars)
    assert (got.x, got.y) == (exp.x, exp.y)


def test_msm_sorted_all_same_bucket():
    # every scalar identical: one giant run per window
    grp, pts, _ = _setup(n=96)
    scalars = [12345] * 96
    got = _run("bn128", grp, pts, scalars, CFG, max_bits=16)
    exp = _expected(grp, pts, scalars)
    assert (got.x, got.y) == (exp.x, exp.y)


def test_msm_sorted_bit_witness_deep_merge():
    """zkSNARK-witness scalar distribution: almost every scalar is 0 or 1,
    so bucket 1 of window 0 holds nearly all points and the per-bucket
    record count after the accumulation walk hits the M1 worst case. With
    this config (K2 = cap1//lw2 = 3) the <= 2-records-per-bucket dense
    table needs FOUR merge levels (32 -> 12 -> 5 -> 3 -> 2); the round-3
    fixed two-level schedule silently dropped records and corrupted
    window 0 (the BENCH_r03 sha256 verify failure)."""
    cfg = MSMConfig(c=8, M1=32, R=1, lw2=64, interpret=True)
    grp, pts, _ = _setup(n=256)
    rng = np.random.default_rng(7)
    scalars = [int(b) for b in rng.integers(0, 2, 256)]
    scalars[5] = 0xBEEF  # a few multi-window values in the mix
    scalars[77] = 0xF00D
    got = _run("bn128", grp, pts, scalars, cfg, max_bits=16)
    exp = _expected(grp, pts, scalars)
    assert (got.x, got.y) == (exp.x, exp.y)


def test_msm_sorted_split_plan():
    """Two-group sparse window split (dense low windows + last-Ks sparse
    high windows) against the host oracle. Mirrors the fused Groth16
    prover's composition: per-group _msm_from_plan, window sums
    concatenated in window order, one combine."""
    import jax

    from zokrates_tpu.kernels.msm_sorted import (
        _msm_from_plan,
        _msm_plan_split,
        combine_windows,
    )

    cfg = MSMConfig(c=8, M1=32, R=2, lw2=8, interpret=True)
    grp, pts, _ = _setup(n=128)
    rng = np.random.default_rng(11)
    scalars = [int(b) for b in rng.integers(0, 2, 128)]  # window 0 dense
    scalars[7] = 0xBE01  # a few high-window digits (sparse group)
    scalars[21] = 0xF00D
    scalars[40] = 0x1234

    f = field_ops(grp.q)
    X = f.encode([p.x for p in pts])
    Y = f.encode([p.y for p in pts])
    S = jnp.asarray(ints_to_limbs(scalars, n_limbs(grp.r)))
    X, Y, S = pad_msm_inputs(grp.q, X, Y, S, min_n=cfg.M1 * cfg.R)
    P128 = pack_points(grp.q, X, Y)
    N = P128.shape[0]
    W, w0, Ks = 3, 1, 64  # nnz(w>=1) == 3 <= Ks = M1*R < N

    pd, ps = _msm_plan_split(W, N, cfg, S, w0, Ks)
    out_d, _ = _msm_from_plan(grp.q, w0, N, cfg, P128, pd, True)
    out_s, _ = _msm_from_plan(grp.q, W - w0, N, cfg, P128, ps, True)
    wXYZ = tuple(
        np.concatenate(
            [np.asarray(jax.device_get(out_d[i])),
             np.asarray(jax.device_get(out_s[i]))], axis=0
        )
        for i in range(3)
    )
    jx, jy, jz = combine_windows(grp.q, grp.r, wXYZ, W, cfg)
    exp = _expected(grp, pts, scalars)
    zinv = pow(jz, -1, grp.q)
    got = (jx * zinv * zinv % grp.q, jy * zinv * zinv % grp.q * zinv % grp.q)
    assert got == (exp.x, exp.y)


def test_windows_counts():
    from zokrates_tpu.fields.params import SCALAR_FIELDS

    assert _windows(SCALAR_FIELDS["bn128"].p, 16) == 16
    assert _windows(SCALAR_FIELDS["bls12_381"].p, 16) == 16
    assert _windows(SCALAR_FIELDS["bw6_761"].p, 16) == 24


def test_msm_sorted_g2():
    """Fq2 walk kernels (pallas_field._F2) against the host tower oracle.

    G2 rows pack each Fq2 coordinate as [c0|c1] limbs; the same walk /
    merge machinery runs with nl doubled, and the interpret path reduces
    through the beta-aware XLA suffix epilogue."""
    from zokrates_tpu.ec.curve import g2_group
    from zokrates_tpu.ec.tower import Fq2
    from zokrates_tpu.fields.jfield2 import field_ops2
    from zokrates_tpu.kernels.msm_sorted import msm_sorted_host, pack_points_g2

    grp = g2_group("bn128")
    n = 64
    rng = np.random.default_rng(3)
    g = grp.generator()
    pts, acc = [], g
    step = g * 7
    for _ in range(n):
        pts.append(acc)
        acc = acc + step
    scalars = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    f2 = field_ops2(grp.q, grp.tower.beta)
    X = f2.encode([(p.x.c0, p.x.c1) for p in pts])
    Y = f2.encode([(p.y.c0, p.y.c1) for p in pts])
    nls = n_limbs(grp.r)
    S = jnp.asarray(ints_to_limbs([s % grp.r for s in scalars], nls))
    P128 = pack_points_g2(grp.q, X, Y)
    cfg = MSMConfig(c=8, M1=32, R=2, lw2=8, interpret=True)
    beta = grp.tower.beta - grp.q
    jx, jy, jz = msm_sorted_host(
        grp.q, grp.r, P128, S, cfg, max_bits=62, beta=beta
    )
    exp = grp.zero()
    for pt, s in zip(pts, scalars):
        exp = exp + pt * s
    zf = Fq2(grp.tower, jz[0], jz[1])
    zi = zf.inv()
    zi2 = zi * zi
    xf = Fq2(grp.tower, jx[0], jx[1]) * zi2
    yf = Fq2(grp.tower, jy[0], jy[1]) * zi2 * zi
    assert (xf.c0, xf.c1) == (exp.x.c0, exp.x.c1)
    assert (yf.c0, yf.c1) == (exp.y.c0, exp.y.c1)


def test_msm_shared_bucket_fixed_base():
    """Shared-bucket fixed-base plan (_msm_plan_shared): the W window
    copies 2^(cw) * P_j scatter into ONE bucket space; the walk result is
    the full MSM directly (no window combine). Validated against the
    host oracle with full-width scalars."""
    import jax

    from zokrates_tpu.kernels.msm_sorted import (
        _fold_override,
        _msm_from_plan,
        _msm_plan_shared,
        combine_windows,
    )

    n = 64
    grp, pts, _ = _setup(n=n)
    rng = np.random.default_rng(3)
    scalars = [int.from_bytes(rng.bytes(32), "little") % grp.r for _ in range(n)]
    cfg = MSMConfig(c=8, M1=32, R=2, lw2=8, interpret=True)
    Wc = _windows(grp.r, cfg.c)

    # pre-shifted copies, w-major: row w*n + j = 2^(cw) * P_j
    shifted = []
    for w in range(Wc):
        sh = pow(2, cfg.c * w, grp.r)
        shifted.extend(p * sh for p in pts)
    f = field_ops(grp.q)
    X = f.encode([p.x for p in shifted])
    Y = f.encode([p.y for p in shifted])
    P128 = pack_points(grp.q, X, Y)

    nls = n_limbs(grp.r)
    S = jnp.asarray(ints_to_limbs(scalars, nls))
    fold = _fold_override(cfg)
    plan = _msm_plan_shared(Wc, n, cfg, S)
    out, _ = _msm_from_plan(
        grp.q, 1, Wc * n, cfg, P128, plan, True, beta=None, fold=fold
    )
    jx, jy, jz = combine_windows(
        grp.q, grp.r, jax.device_get(out), 1, cfg
    )
    exp = _expected(grp, pts, scalars)
    if jz == 0:
        assert exp.infinity
    else:
        zi = pow(jz, -1, grp.q)
        got = (jx * zi * zi % grp.q, jy * zi * zi % grp.q * zi % grp.q)
        assert got == (exp.x, exp.y)
