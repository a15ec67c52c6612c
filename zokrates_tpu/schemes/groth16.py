"""Groth16 setup / prove / verify, TPU-first and device-resident.

The reference delegates all of this to arkworks (zokrates_ark/src/groth16.rs)
or bellman (zokrates_bellman); here the algorithm is assembled from our own
kernels, with every hot stage on device:

  * setup evaluates the QAP at tau on the host (sparse integer sums) but
    produces every pk/vk group element with the *device* fixed-base MSM
    (kernels/fixed_base.py — window tables + batched mixed adds + batch
    inversion), not per-element host ladders,
  * the pk stores points pre-packed in the MSM kernel's layout
    ((N, 128) uint32 rows [x|y|-y|pad], Montgomery limbs), so proving
    never touches host point math,
  * proving evaluates A·z / B·z / C·z as device COO sparse matvecs
    (ir/r1cs_device.py), computes h(X) = (A·B - C)/Z with device coset
    NTT round-trips, converts h out of Montgomery form *on device*, and
    feeds the sort-based Pallas MSM (kernels/msm_sorted.py) — the only
    host work is the final ~16 window-combine point additions,
  * verification uses the host pairing-product oracle (4 Miller loops).

Proof/VK JSON is byte-compatible with zokrates_proof_systems/scheme/
groth16.rs {a,b,c} / {alpha,beta,gamma,delta,gamma_abc}.

Prove call stack mirrors /root/reference/zokrates_ark/src/groth16.rs:21-52
(witness map -> h via iNTT/coset NTT -> MSMs A,B1,B2,C,H).
"""

from __future__ import annotations

import os
import secrets
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ec.curve import PointG1, PointG2, g1_group, g2_group
from ..ec.pairing import pairing_product_is_one
from ..fields import params as P
from ..fields.limbs import ints_to_limbs, limbs_to_ints, n_limbs
from ..ir.r1cs import R1CS
from ..ir.r1cs_device import R1CSDevice
from ..ir.witness import Witness
from ..kernels.jec import curve_ops, curve_ops_g2
from ..kernels.msm import msm_jit
from ..kernels.ntt import domain_for_curve
from .types import (
    Proof,
    VerificationKey,
    fr_from_json,
    fr_to_json,
    g1_from_json,
    g1_to_json,
    g2_from_json,
    g2_to_json,
)


def _next_pow2(n: int) -> int:
    return 1 << max(1, (n - 1).bit_length())


def _msm_backend() -> str:
    """'sorted' (Pallas, default on TPU) or 'xla' (default on CPU tests —
    interpret-mode Pallas compiles are minutes each on XLA:CPU)."""
    mode = os.environ.get("ZOKRATES_TPU_MSM", "auto")
    if mode != "auto":
        return mode
    return "sorted" if jax.default_backend() == "tpu" else "xla"


# ---------------------------------------------------------------------------
# Proving key
# ---------------------------------------------------------------------------


class ProvingKey:
    """Groth16 proving key with queries pre-packed for the device MSM.

    Layout per G1 query: (m, 128) uint32 rows [x | y | -y | zero-pad]
    (Montgomery limbs), one row per witness index — the a/b1/l/b2 queries
    are all z-ALIGNED so the four witness-scalar MSMs share one sorted
    plan. Where the reference has no query element (zero polynomial, or
    l's leading num_instance slots) the row holds the DISTINCT dummy
    point (i+1)*G and the mask is False; provers either zero the scalar
    at masked slots (XLA / sharded paths) or run the raw witness vector
    and subtract the device-computed correction sum_masked z_i*(i+1) * G
    (fused sorted path — see corr_w). The b2 query packs G2 rows
    [x.c0|x.c1|y.c0|y.c1|-y.c0|-y.c1] with the same mask as b1.

    Everything is numpy (pickle-friendly); device copies are cached
    per-process on first prove.
    """

    def __init__(
        self,
        curve: str,
        domain_size: int,
        num_instance: int,
        alpha_g1: PointG1,
        beta_g1: PointG1,
        beta_g2,
        delta_g1: PointG1,
        delta_g2,
        a_p128: np.ndarray,
        a_mask: np.ndarray,
        b1_p128: np.ndarray,
        b1_mask: np.ndarray,
        b2_p128: np.ndarray,
        b2_mask: np.ndarray,
        h_p128: np.ndarray,
        l_p128: np.ndarray,
        l_mask: np.ndarray,
        corr_w: np.ndarray,
        b2_xy: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        h16_p128: Optional[np.ndarray] = None,
    ):
        self.curve = curve
        self.domain_size = domain_size
        self.num_instance = num_instance
        self.alpha_g1 = alpha_g1
        self.beta_g1 = beta_g1
        self.beta_g2 = beta_g2
        self.delta_g1 = delta_g1
        self.delta_g2 = delta_g2
        self.a_p128 = a_p128
        self.a_mask = a_mask
        self.b1_p128 = b1_p128
        self.b1_mask = b1_mask
        self.b2_p128 = b2_p128
        self.b2_mask = b2_mask
        self.h_p128 = h_p128
        self.l_p128 = l_p128
        self.l_mask = l_mask
        self.corr_w = corr_w  # (3, m, nl) Montgomery dummy weights: a, b, l
        # shared-bucket fixed-base h query: (Wc * N_hw, 128) rows, row
        # w*N_hw + j = 2^(16w) * h_j (see _msm_plan_shared); None for
        # large domains or pre-round-5 keys
        self.h16_p128 = h16_p128
        # wide-field curves (6*nl > 128, e.g. bls12_381 G2) cannot pack
        # G2 rows into the 128-column gather layout: b2_p128 is None and
        # the raw coordinate arrays are kept instead (XLA G2 path only)
        self._b2_xy = b2_xy
        self._dev: Dict = {}

    # -- G2 coordinate views (XLA Pippenger / sharded prover) --------------
    @property
    def b2_x(self) -> np.ndarray:
        if self.b2_p128 is None:
            return self._b2_xy[0]
        nl = n_limbs(P.BASE_FIELDS[self.curve].p)
        m = self.b2_p128.shape[0]
        return self.b2_p128[:, : 2 * nl].reshape(m, 2, nl)

    @property
    def b2_y(self) -> np.ndarray:
        if self.b2_p128 is None:
            return self._b2_xy[1]
        nl = n_limbs(P.BASE_FIELDS[self.curve].p)
        m = self.b2_p128.shape[0]
        return self.b2_p128[:, 2 * nl : 4 * nl].reshape(m, 2, nl)

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_dev"] = {}
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self.__dict__.setdefault("h16_p128", None)
        self._dev = {}

    # -- host-point views (MPC ceremony mutates these) ---------------------
    def _unpack_g1(self, p128: np.ndarray, mask=None) -> List[Optional[Tuple[int, int]]]:
        q = P.BASE_FIELDS[self.curve].p
        from ..fields.jfield import field_ops

        f = field_ops(q)
        nl = f.nl
        arr = jnp.asarray(p128[:, : 2 * nl])
        xs = f.decode(arr[:, :nl])
        ys = f.decode(arr[:, nl : 2 * nl])
        out: List[Optional[Tuple[int, int]]] = []
        for i in range(len(xs)):
            if mask is not None and not mask[i]:
                out.append(None)
            else:
                out.append((xs[i], ys[i]))
        return out

    def _pack_g1(self, pts: Sequence[Optional[Tuple[int, int]]]):
        return _pack_query(self.curve, pts)

    @property
    def h_query(self) -> List[Tuple[int, int]]:
        return self._unpack_g1(self.h_p128)

    @h_query.setter
    def h_query(self, pts):
        self.h_p128, _ = _pack_query(self.curve, pts)
        self.h16_p128 = None  # shifted copies are stale after mutation
        self._dev.clear()

    @property
    def l_query(self) -> List[Optional[Tuple[int, int]]]:
        """Reference-shaped l query: one entry per witness index >= ni
        (the internal array is z-aligned with dummies at [0, ni))."""
        ni = self.num_instance
        return self._unpack_g1(self.l_p128[ni:], self.l_mask[ni:])

    @l_query.setter
    def l_query(self, pts):
        ni = self.num_instance
        m = ni + len(pts)
        full = [None] * ni + list(pts)
        self.l_p128, self.l_mask, self.corr_w[2] = _pack_query_dummied(
            self.curve, full
        )
        self._dev.clear()

    # -- device cache -------------------------------------------------------
    def dev(self):
        if not self._dev:
            self._dev = {
                "a": jnp.asarray(self.a_p128),
                "a_mask": jnp.asarray(self.a_mask),
                "b1": jnp.asarray(self.b1_p128),
                "b1_mask": jnp.asarray(self.b1_mask),
                "b2_x": jnp.asarray(self.b2_x),
                "b2_y": jnp.asarray(self.b2_y),
                "b2_mask": jnp.asarray(self.b2_mask),
                "h": jnp.asarray(self.h_p128),
                "l": jnp.asarray(self.l_p128),
                "l_mask": jnp.asarray(self.l_mask),
            }
        return self._dev


def _pack_query(curve: str, pts: Sequence[Optional[Tuple[int, int]]]):
    """Host affine points (None = zero poly) -> packed rows + mask."""
    from ..fields.jfield import field_ops
    from ..kernels.msm_sorted import pack_points

    q = P.BASE_FIELDS[curve].p
    f = field_ops(q)
    mask = np.asarray([pt is not None for pt in pts], dtype=bool)
    xs = [pt[0] if pt else 0 for pt in pts]
    ys = [pt[1] if pt else 0 for pt in pts]
    X = f.encode(xs)
    Y = f.encode(ys)
    p128 = np.asarray(jax.device_get(pack_points(q, X, Y)))
    return p128, mask


def _pack_query_dummied(curve: str, pts: Sequence[Optional[Tuple[int, int]]]):
    """Host affine points (None = absent) -> z-aligned packed rows with
    DISTINCT dummy points (i+1)*G at absent slots, mask (False = dummy),
    and the (m, nl_r) Montgomery correction-weight rows (i+1 at dummies,
    0 elsewhere)."""
    from ..fields.jfield import field_ops

    grp = g1_group(curve)
    g = grp.generator()
    p_r = P.SCALAR_FIELDS[curve].p
    fr = field_ops(p_r)
    full = []
    weights = []
    for i, pt in enumerate(pts):
        if pt is None:
            d = g * (i + 1)
            full.append((d.x, d.y))
            weights.append(i + 1)
        else:
            full.append(pt)
            weights.append(0)
    p128, _ = _pack_query(curve, full)
    mask = np.asarray([pt is not None for pt in pts], dtype=bool)
    corr_w = np.asarray(jax.device_get(fr.encode(weights)))
    return p128, mask, corr_w


def _pack_from_device(curve: str, ax, ay, inf):
    """Device affine Montgomery coords + inf mask -> packed rows + mask."""
    from ..kernels.msm_sorted import pack_points

    q = P.BASE_FIELDS[curve].p
    p128 = np.asarray(jax.device_get(pack_points(q, ax, ay)))
    mask = ~np.asarray(jax.device_get(inf))
    return p128, mask


# ---------------------------------------------------------------------------
# Setup
# ---------------------------------------------------------------------------


def _lagrange_at_tau(p: int, n: int, omega: int, tau: int) -> List[int]:
    """L_r(tau) for r in 0..n over the size-n domain: Z(tau) w^r / (n (tau - w^r))."""
    z_tau = (pow(tau, n, p) - 1) % p
    n_inv = pow(n, -1, p)
    out = []
    w_r = 1
    for _ in range(n):
        out.append(z_tau * w_r % p * pow((tau - w_r) % p, -1, p) % p * n_inv % p)
        w_r = w_r * omega % p
    return out


def _qap_evals_at_tau(r1cs: R1CS, n: int, lag: List[int], p: int):
    """a_tau[i], b_tau[i], c_tau[i] per dense variable (instance rows added)."""
    m = r1cs.num_variables
    a_t = [0] * m
    b_t = [0] * m
    c_t = [0] * m
    for r, row in enumerate(r1cs.A):
        for i, coef in row:
            a_t[i] = (a_t[i] + coef * lag[r]) % p
    for r, row in enumerate(r1cs.B):
        for i, coef in row:
            b_t[i] = (b_t[i] + coef * lag[r]) % p
    for r, row in enumerate(r1cs.C):
        for i, coef in row:
            c_t[i] = (c_t[i] + coef * lag[r]) % p
    # instance-binding rows: A[nc + j] has a 1 at instance variable j
    nc = r1cs.num_constraints
    for j in range(r1cs.num_instance):
        a_t[j] = (a_t[j] + lag[nc + j]) % p
    return a_t, b_t, c_t


def _fb_g1(curve: str, scalars: List[int]):
    """Device fixed-base s_i*G1 -> (packed rows, mask) numpy."""
    from ..kernels.fixed_base import batch_normalize, fixed_base_for

    grp = g1_group(curve)
    fb = fixed_base_for(curve, "g1")
    S = jnp.asarray(ints_to_limbs([s % grp.r for s in scalars], n_limbs(grp.r)))
    ax, ay, inf = fb.to_affine(S)
    return _pack_from_device(curve, ax, ay, inf)


def _fb_g1_points(curve: str, scalars: List[int]) -> List[Optional[PointG1]]:
    """Device fixed-base -> host points (for the few vk elements)."""
    from ..kernels.fixed_base import fixed_base_for

    grp = g1_group(curve)
    fb = fixed_base_for(curve, "g1")
    S = jnp.asarray(ints_to_limbs([s % grp.r for s in scalars], n_limbs(grp.r)))
    ops = fb.ops
    aff = ops.to_affine_ints(fb(S))
    return [None if a is None else PointG1(grp, a[0], a[1]) for a in aff]


def _fb_g2(curve: str, scalars: List[int]):
    """Device fixed-base s_i*G2 -> (x, y (n,2,nl) Montgomery, mask) numpy."""
    from ..kernels.fixed_base import batch_normalize, fixed_base_for

    grp = g2_group(curve)
    fb = fixed_base_for(curve, "g2")
    S = jnp.asarray(ints_to_limbs([s % grp.r for s in scalars], n_limbs(grp.r)))
    ax, ay, inf = fb.to_affine(S)
    return (
        np.asarray(jax.device_get(ax)),
        np.asarray(jax.device_get(ay)),
        ~np.asarray(jax.device_get(inf)),
    )


def setup(r1cs: R1CS, rng=None) -> Tuple[ProvingKey, VerificationKey]:
    curve = r1cs.curve
    p = P.SCALAR_FIELDS[curve].p
    rand = rng or (lambda: secrets.randbelow(p - 1) + 1)

    g1 = g1_group(curve).generator()
    g2 = g2_group(curve).generator()

    nc, ni = r1cs.num_constraints, r1cs.num_instance
    n = _next_pow2(nc + ni)
    dom = domain_for_curve(curve, n)

    alpha, beta, gamma, delta, tau = (rand() for _ in range(5))

    lag = _lagrange_at_tau(p, n, dom.omega, tau)
    a_t, b_t, c_t = _qap_evals_at_tau(r1cs, n, lag, p)

    gamma_inv = pow(gamma, -1, p)
    delta_inv = pow(delta, -1, p)
    z_tau = (pow(tau, n, p) - 1) % p

    m = r1cs.num_variables

    # h query scalars: tau^j * Z(tau) / delta, j in 0..n-2
    h_s = []
    tp = z_tau * delta_inv % p
    for _ in range(n - 1):
        h_s.append(tp)
        tp = tp * tau % p

    # z-aligned l query: dummies at the instance slots and absent entries
    l_full = [0] * m
    for i in range(ni, m):
        l_full[i] = (beta * a_t[i] + alpha * b_t[i] + c_t[i]) % p * delta_inv % p
    abc_s = [
        (beta * a_t[i] + alpha * b_t[i] + c_t[i]) % p * gamma_inv % p
        for i in range(ni)
    ]

    # every query row is a valid affine point: absent entries get the
    # DISTINCT dummy point (i+1)*G (fixed-base over the dummied scalar),
    # so the fused prover can run the raw witness vector and subtract the
    # correction sum_dummy z_i*(i+1) afterwards. Masks mark real entries.
    def dummied(scalars):
        return [s if s else (i + 1) for i, s in enumerate(scalars)]

    from ..fields.jfield import field_ops as _field_ops
    from ..kernels.msm_sorted import pack_points_g2

    fr = _field_ops(p)

    def weights(scalars):
        return np.asarray(
            jax.device_get(
                fr.encode([0 if s else (i + 1) for i, s in enumerate(scalars)])
            )
        )

    a_p128, _ = _fb_g1(curve, dummied(a_t))
    b1_p128, _ = _fb_g1(curve, dummied(b_t))
    h_p128, _ = _fb_g1(curve, h_s)
    l_p128, _ = _fb_g1(curve, dummied(l_full))

    # shared-bucket fixed-base form of the h query (kernels/msm_sorted.
    # _msm_plan_shared): 16 pre-shifted copies 2^(16w) * P_j laid out
    # w-major over the PADDED MSM tier, so the prover's c=16 digits of
    # h index rows w*N + j directly. ~0.5 KB/point/window of pk storage
    # — gated to n <= 2^17 (2^20 domains would need ~8.6 GB)
    h16_p128 = None
    if n - 1 <= (1 << 17) and jax.default_backend() == "tpu":
        from ..kernels.msm_sorted import shared_window_count

        Wc = shared_window_count(p, 16)
        Nh = _hw_fused_tier(m, n)
        shifted: List[int] = []
        for w in range(Wc):
            sh = pow(2, 16 * w, p)
            col = [s * sh % p for s in h_s] + [0] * (Nh - (n - 1))
            shifted.extend(col)
        h16_p128, _ = _fb_g1(curve, shifted)
    b2x, b2y, _ = _fb_g2(curve, dummied(b_t))
    nlq = n_limbs(P.BASE_FIELDS[curve].p)
    if 6 * nlq <= 128:
        b2_p128 = np.asarray(
            jax.device_get(pack_points_g2(P.BASE_FIELDS[curve].p,
                                          jnp.asarray(b2x), jnp.asarray(b2y)))
        )
        b2_xy = None
    else:  # wide-field G2 rows don't fit the 128-col gather layout
        b2_p128 = None
        b2_xy = (np.asarray(b2x), np.asarray(b2y))
    a_mask = np.asarray([s != 0 for s in a_t], dtype=bool)
    b_mask = np.asarray([s != 0 for s in b_t], dtype=bool)
    l_mask = np.asarray([s != 0 for s in l_full], dtype=bool)
    corr_w = np.stack([weights(a_t), weights(b_t), weights(l_full)])

    gamma_abc = _fb_g1_points(curve, abc_s)
    # vk points must be affine non-None; abc scalars are nonzero w.h.p. but
    # guard the degenerate case by host math
    gamma_abc = [
        pt if pt is not None else g1_group(curve).zero() for pt in gamma_abc
    ]

    pk = ProvingKey(
        curve=curve,
        domain_size=n,
        num_instance=ni,
        alpha_g1=g1 * alpha,
        beta_g1=g1 * beta,
        beta_g2=g2 * beta,
        delta_g1=g1 * delta,
        delta_g2=g2 * delta,
        a_p128=a_p128,
        a_mask=a_mask,
        b1_p128=b1_p128,
        b1_mask=b_mask,
        b2_p128=b2_p128,
        b2_mask=b_mask,
        h_p128=h_p128,
        l_p128=l_p128,
        l_mask=l_mask,
        corr_w=corr_w,
        b2_xy=b2_xy,
        h16_p128=h16_p128,
    )
    vk = VerificationKey(
        "g16",
        curve,
        {
            "alpha": g1_to_json(g1 * alpha, curve),
            "beta": g2_to_json(g2 * beta, curve),
            "gamma": g2_to_json(g2 * gamma, curve),
            "delta": g2_to_json(g2 * delta, curve),
            "gamma_abc": [g1_to_json(pt, curve) for pt in gamma_abc],
        },
    )
    return pk, vk


# ---------------------------------------------------------------------------
# Legacy helpers (shared with gm17/kzg/nova; host-point API)
# ---------------------------------------------------------------------------


def _matrix_evals(rows, z: Sequence[int], n: int, p: int) -> List[int]:
    out = [0] * n
    for r, row in enumerate(rows):
        acc = 0
        for i, coef in row:
            acc += coef * z[i]
        out[r] = acc % p
    return out


def _auto_c(n: int) -> int:
    return 4 if n <= 1024 else (8 if n <= (1 << 17) else 16)


def _pad_pairs(pairs):
    """Pad to the next power of two with (first point, scalar 0) — zero
    scalars fall into the dropped bucket, and pow2 sizes share MSM
    compilations across circuits."""
    n = 1 << max(2, (len(pairs) - 1).bit_length())
    return pairs + [(pairs[0][0], 0)] * (n - len(pairs))


def _msm_g1(curve: str, points: List[Optional[Tuple[int, int]]], scalars: List[int], c: int = None) -> PointG1:
    """Device G1 MSM over host point lists; drops None points (zero polys).

    Dispatches through _msm_packed_g1, so GM17/Marlin/KZG/MPC proves ride
    the sorted Pallas kernel on TPU (the XLA Pippenger remains the CPU
    path)."""
    grp = g1_group(curve)
    pairs = [(pt, s % grp.r) for pt, s in zip(points, scalars) if pt is not None and s % grp.r != 0]
    if not pairs:
        return grp.zero()
    pairs = _pad_pairs(pairs)
    if _msm_backend() == "sorted":
        from ..fields.jfield import field_ops
        from ..kernels.msm_sorted import pack_points

        f = field_ops(grp.q)
        X = f.encode([pt[0] for pt, _ in pairs])
        Y = f.encode([pt[1] for pt, _ in pairs])
        P128 = pack_points(grp.q, X, Y)
        S = jnp.asarray(ints_to_limbs([s for _, s in pairs], n_limbs(grp.r)))
        return _msm_packed_g1(curve, P128, S)
    c = c or _auto_c(len(pairs))
    ops = curve_ops(grp.q)
    Px = ops.f.encode([pt[0] for pt, _ in pairs])
    Py = ops.f.encode([pt[1] for pt, _ in pairs])
    nls = n_limbs(grp.r)
    S = jnp.asarray(ints_to_limbs([s for _, s in pairs], nls))
    res = msm_jit(ops, c)(Px, Py, S)
    aff = ops.to_affine_ints((res[0][None], res[1][None], res[2][None]))[0]
    return grp.zero() if aff is None else PointG1(grp, aff[0], aff[1])


def _msm_g2(curve: str, points: List[Optional[object]], scalars: List[int], c: int = None):
    grp = g2_group(curve)
    pairs = [(pt, s % grp.r) for pt, s in zip(points, scalars) if pt is not None and s % grp.r != 0]
    if not pairs:
        return grp.zero()
    pairs = _pad_pairs(pairs)
    c = c or _auto_c(len(pairs))
    if not hasattr(pairs[0][0].x, "c0"):
        # BW6-style G2 over the base field: same ops as G1 (a=0 formulas)
        ops = curve_ops(grp.q)
        Px = ops.f.encode([pt.x for pt, _ in pairs])
        Py = ops.f.encode([pt.y for pt, _ in pairs])
        S = jnp.asarray(ints_to_limbs([s for _, s in pairs], n_limbs(grp.r)))
        res = msm_jit(ops, c)(Px, Py, S)
        aff = ops.to_affine_ints((res[0][None], res[1][None], res[2][None]))[0]
        return grp.zero() if aff is None else grp.point(aff[0], aff[1])
    ops = curve_ops_g2(curve)
    Px = ops.f.encode([(pt.x.c0, pt.x.c1) for pt, _ in pairs])
    Py = ops.f.encode([(pt.y.c0, pt.y.c1) for pt, _ in pairs])
    nls = n_limbs(grp.r)
    S = jnp.asarray(ints_to_limbs([s for _, s in pairs], nls))
    nlq = n_limbs(grp.q)
    if _msm_backend() == "sorted" and 6 * nlq <= 128:
        # _msm_dev_g2 carries the Fq2 sorted-walk dispatch
        return _msm_dev_g2(curve, Px, Py, S)
    res = msm_jit(ops, c)(Px, Py, S)
    aff = ops.to_affine_ints((res[0][None], res[1][None], res[2][None]))[0]
    if aff is None:
        return grp.zero()
    from ..ec.tower import Fq2

    x = Fq2(grp.tower, aff[0][0], aff[0][1])
    y = Fq2(grp.tower, aff[1][0], aff[1][1])
    return PointG2(grp, x, y)


def compute_h(r1cs: R1CS, z: Sequence[int], n: int) -> List[int]:
    """Coefficients of h(X) = (A(X)B(X) - C(X)) / Z(X), via coset NTTs.
    Host-z variant kept for gm17; the Groth16 prover uses _h_stage."""
    curve = r1cs.curve
    p = P.SCALAR_FIELDS[curve].p
    nls = n_limbs(p)
    z_can = jnp.asarray(ints_to_limbs([v % p for v in z], nls))
    dev = _r1cs_device(r1cs, n)
    h_can = _h_stage(curve, n)(
        *_coo_args(dev), jnp.asarray(z_can)
    )
    return limbs_to_ints(np.asarray(jax.device_get(h_can)))[: n - 1]


# ---------------------------------------------------------------------------
# Device prove pipeline
# ---------------------------------------------------------------------------

_R1CS_DEV_CACHE: Dict = {}


def _r1cs_device(r1cs: R1CS, n: int) -> R1CSDevice:
    key = (id(r1cs), n)
    dev = _R1CS_DEV_CACHE.get(key)
    if dev is None:
        dev = R1CSDevice.build(r1cs, n)
        _R1CS_DEV_CACHE[key] = dev
    return dev


def _coo_args(dev: R1CSDevice):
    return (
        dev.A.rows, dev.A.cols, dev.A.coeff,
        dev.B.rows, dev.B.cols, dev.B.coeff,
        dev.C.rows, dev.C.cols, dev.C.coeff,
    )


def _matvec_kind() -> str:
    """'walk' (fused Pallas mulacc matvec) on hardware, 'coo' elsewhere."""
    return "walk" if jax.default_backend() == "tpu" else "coo"


def _matvec_args(dev: R1CSDevice, kind: str):
    if kind == "walk":
        from ..ir.r1cs_device import build_mulacc_walk

        w = build_mulacc_walk(dev)
        return (w.cols, w.coeff_walk, w.flags_walk, w.pos, w.seg)
    return _coo_args(dev)


_H_JIT: Dict = {}
_H_RAW: Dict = {}


def _h_stage(curve: str, n: int):
    """Jitted z -> h(X) canonical limbs: to_mont, 3 sparse matvecs, QAP
    coset-NTT division, from_mont. COO arrays are runtime args (not baked
    constants) so one executable serves every circuit of domain size n.

    The raw pipeline (_H_RAW) is BATCHED: z (B, m, nl) -> h (B, n, nl),
    with all 6B iNTT/coset-NTT transforms flattened into ONE stacked
    transform call (on TPU a single whole-transform Pallas kernel,
    kernels/ntt_pallas.py) — B proofs cost one op per stage, not B.
    The public _h_stage callable keeps the single-z signature."""
    key = (curve, n)
    fn = _H_JIT.get(key)
    if fn is not None:
        return fn

    p = P.SCALAR_FIELDS[curve].p
    from ..fields.jfield import field_ops

    f = field_ops(p)
    dom = domain_for_curve(curve, n)
    g = P.SCALAR_FIELDS[curve].smallest_nonresidue
    z_on_coset_inv = pow((pow(g, n, p) - 1) % p, -1, p)
    dom.warm_coset(g)
    zinv_mont = f.encode_scalar(z_on_coset_inv)

    import jax.ops

    # Pallas elementwise field kernels on hardware: the XLA scan-CIOS
    # multiply streams a (B, L, nl+1) carry tensor through HBM once per
    # limb — profiled at 85 ms for the matvec multiply alone (B=8,
    # L=403k) vs ~2 ms in-kernel; reduce_wide similarly 38 -> ~2 ms.
    use_pl = jax.default_backend() == "tpu"

    def _mul_big(a, b):
        """a (B, L, nl) x b ((L, nl) shared or (B, L, nl)) elementwise."""
        if use_pl:
            from ..kernels.pallas_field import emul

            return emul(p, a, b)
        return f.mul_(a, b[None] if b.ndim == 2 else b)

    def _reduce_big(t):
        if use_pl:
            from ..kernels.pallas_field import ereduce_wide

            return ereduce_wide(p, t)
        return f.reduce_wide_(t)

    def _to_mont_big(Z):
        if use_pl:
            from ..kernels.pallas_field import emul

            r2 = jnp.broadcast_to(
                jnp.asarray(np.asarray(f.spec.r2_limbs, dtype=np.uint32)),
                Z.shape[1:],
            )
            return emul(p, Z, r2)
        return f.to_mont_(Z)

    def _h_tail(abc_e, B):
        """(B*3, n, nl) A/B/C evaluations -> (B, n, nl) canonical h."""
        abc_cs = dom.coset_fft(dom.ifft(abc_e), g).reshape(B, 3, n, -1)
        ab = _mul_big(abc_cs[:, 0], abc_cs[:, 1])
        zrow = jnp.broadcast_to(zinv_mont, (n, abc_cs.shape[-1]))
        h_cs = _mul_big(f.sub_(ab, abc_cs[:, 2]), zrow)
        h = dom.coset_ifft(h_cs, g)
        return f.from_mont_(h)

    def pipeline(ar, ac, av, br, bc, bv, cr, cc, cv, Z):
        B = Z.shape[0]
        Z_mont = _to_mont_big(Z)
        # one fused 3-matrix matvec: rows offset into disjoint segment
        # blocks (each block's rows stay sorted, so the concatenation is
        # sorted too) -> single gather + mul + segment_sum, vmapped over
        # the proof batch
        rows_all = jnp.concatenate([ar, br + n, cr + 2 * n])
        cols_all = jnp.concatenate([ac, bc, cc])
        coeff_all = jnp.concatenate([av, bv, cv])
        vals = _mul_big(jnp.take(Z_mont, cols_all, axis=1), coeff_all)
        sums = jax.vmap(
            lambda v: jax.ops.segment_sum(
                v, rows_all, num_segments=3 * n, indices_are_sorted=True
            )
        )(vals)
        abc_e = _reduce_big(sums).reshape(B * 3, n, -1)
        return _h_tail(abc_e, B)

    def pipeline_walk(cols, cw, fl, pos, seg, Z):
        """Mulacc-walk matvec (TPU): one fused multiply-accumulate kernel
        over the row-sorted COO records (kernels/pallas_field.mulacc_walk)
        instead of gather -> emul -> XLA scatter segment_sum. The flush
        structure (flags/pos/seg) is circuit-static, host-precomputed
        (ir/r1cs_device.build_mulacc_walk)."""
        from ..ir.r1cs_device import _MULACC_R
        from ..kernels.pallas_field import ereduce_wide, mulacc_walk

        B = Z.shape[0]
        K, nlw, S, _ = cw.shape
        Mw = S * 128
        Z_mont = _to_mont_big(Z)
        zg = jnp.take(Z_mont, cols, axis=1)  # (B, Lp, nl)
        zw = zg.reshape(B, S, 128, K, nlw).transpose(0, 3, 4, 1, 2)
        out = mulacc_walk(p, zw, cw, fl, _MULACC_R)
        OT = out.transpose(0, 3, 4, 1, 2).reshape(B, Mw * K, nlw)
        part = ereduce_wide(p, jnp.take(OT, pos, axis=1))
        sums = jax.vmap(
            lambda v: jax.ops.segment_sum(
                v, seg, num_segments=3 * n + 1, indices_are_sorted=True
            )
        )(part)[:, : 3 * n]
        abc_e = ereduce_wide(p, sums).reshape(B * 3, n, -1)
        return _h_tail(abc_e, B)

    def pipeline_single(ar, ac, av, br, bc, bv, cr, cc, cv, z_can):
        return pipeline(ar, ac, av, br, bc, bv, cr, cc, cv, z_can[None])[0]

    fn = jax.jit(pipeline_single)
    _H_RAW[key] = pipeline
    _H_RAW[(curve, n, "walk")] = pipeline_walk
    _H_JIT[key] = fn
    return fn


def _msm_packed_g1(curve: str, P128, S, mask=None) -> PointG1:
    """G1 MSM: packed device rows x canonical-limb device scalars.

    Pads to the kernel's power-of-two tier; masked/padded slots get scalar
    zero (bucket 0 is skipped by both backends)."""
    grp = g1_group(curve)
    N = P128.shape[0]
    m = S.shape[0]
    assert m <= N, (m, N)
    if mask is not None:
        S = jnp.where(mask[:m, None], S, 0)
    if m < N:
        S = jnp.pad(S, ((0, N - m), (0, 0)))

    if _msm_backend() == "sorted":
        from ..kernels.msm_sorted import default_config, msm_sorted_host

        cfg = default_config(N, interpret=jax.default_backend() != "tpu")
        need = cfg.M1 * cfg.R
        if N % need:
            full = -(-N // need) * need
            P128 = jnp.pad(P128, ((0, full - N), (0, 0)))
            S = jnp.pad(S, ((0, full - N), (0, 0)))
        jx, jy, jz = msm_sorted_host(grp.q, grp.r, P128, S, cfg)
        if jz == 0:
            return grp.zero()
        q = grp.q
        zinv = pow(jz, -1, q)
        return PointG1(grp, jx * zinv * zinv % q, jy * zinv * zinv % q * zinv % q)

    ops = curve_ops(grp.q)
    nl = ops.f.nl
    Px = P128[:, :nl]
    Py = P128[:, nl : 2 * nl]
    res = msm_jit(ops, _auto_c(N))(Px, Py, S)
    aff = ops.to_affine_ints((res[0][None], res[1][None], res[2][None]))[0]
    return grp.zero() if aff is None else PointG1(grp, aff[0], aff[1])


def _msm_dev_g2(curve: str, Px, Py, S, mask=None) -> PointG2:
    grp = g2_group(curve)
    from ..ec.tower import Fq2

    N = Px.shape[0]
    m = S.shape[0]
    if mask is not None:
        S = jnp.where(mask[:m, None], S, 0)
    if m < N:
        S = jnp.pad(S, ((0, N - m), (0, 0)))

    if _msm_backend() == "sorted":
        # Fq2 walk kernels (pallas_field._F2) — the XLA G2 Pippenger's
        # giant fused Fq2 program faults the TPU worker at n >= ~2^15
        # and is dispatch-bound well before that.
        from ..kernels.msm_sorted import (
            default_config,
            msm_sorted_host,
            pack_points_g2,
        )

        beta = grp.tower.beta - grp.q  # small negative representative
        cfg = default_config(N, interpret=jax.default_backend() != "tpu")
        need = cfg.M1 * cfg.R
        P128 = pack_points_g2(grp.q, Px, Py)
        if N % need:
            full = -(-N // need) * need
            P128 = jnp.pad(P128, ((0, full - N), (0, 0)))
            S = jnp.pad(S, ((0, full - N), (0, 0)))
        jx, jy, jz = msm_sorted_host(grp.q, grp.r, P128, S, cfg, beta=beta)
        if jz == (0, 0):
            return grp.zero()
        zf = Fq2(grp.tower, jz[0], jz[1])
        zi = zf.inv()
        zi2 = zi * zi
        xf = Fq2(grp.tower, jx[0], jx[1]) * zi2
        yf = Fq2(grp.tower, jy[0], jy[1]) * zi2 * zi
        return PointG2(grp, xf, yf)

    ops = curve_ops_g2(curve)
    res = msm_jit(ops, _auto_c(N))(Px, Py, S)
    aff = ops.to_affine_ints((res[0][None], res[1][None], res[2][None]))[0]
    if aff is None:
        return grp.zero()
    return PointG2(
        grp,
        Fq2(grp.tower, aff[0][0], aff[0][1]),
        Fq2(grp.tower, aff[1][0], aff[1][1]),
    )


def _pad_rows(arr: np.ndarray, N: int) -> np.ndarray:
    if arr.shape[0] == N:
        return arr
    pad = [(0, N - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def _msm_tier(n: int) -> int:
    """Pad MSM sizes to pow2 so kernel compilations are shared across
    circuits. The sorted Pallas backend additionally requires its own
    minimum (handled by pad inside _msm_packed_g1 via kernel config)."""
    return max(4, _next_pow2(n))


def _hw_fused_tier(m: int, n: int) -> int:
    """The padded point-array size the HARDWARE fused prover uses for a
    circuit with m variables over an n-domain (pow2 tier rounded to the
    hardware walk granularity M1*R = 4096). Setup uses this to lay out
    the shared-bucket h query with the same row stride."""
    N = max(_msm_tier(m), _msm_tier(n - 1))
    need = 4096
    if N % need:
        N = -(-N // need) * need
    return N


_CORR_JIT: Dict = {}


def _corr_stage(curve: str, N: int):
    """Jitted (3, N, nl) Montgomery dummy weights x (N, nl) canonical z ->
    (3, nl) canonical correction scalars sum_i w_i * z_i mod r."""
    key = (curve, N)
    fn = _CORR_JIT.get(key)
    if fn is not None:
        return fn
    p = P.SCALAR_FIELDS[curve].p
    from ..fields.jfield import field_ops

    f = field_ops(p)
    chunk = min(N, 1 << 15)  # u32 lazy-sum headroom (16-bit limb terms)
    C = -(-N // chunk)

    def corr(corr_w, z_can):
        zm = f.to_mont_(z_can)
        prod = f.mul_(corr_w, jnp.broadcast_to(zm[None], corr_w.shape))
        s1 = f.reduce_wide_(
            jnp.sum(prod.reshape(3, C, chunk, -1), axis=2)
        )  # (3, C, nl) Montgomery
        s2 = f.reduce_wide_(jnp.sum(s1, axis=1))
        return f.from_mont_(s2)

    fn = jax.jit(corr)
    _CORR_JIT[key] = fn
    return fn


_COMB_CACHE: Dict = {}


def _fb_mul_g1(pt: PointG1, k: int) -> PointG1:
    """Fixed-base scalar mult with a cached comb table (64 adds, no
    doublings) — the prove tail multiplies the same delta/generator
    points every proof."""
    from ..ec.jacobian import comb_mul_g1, comb_table_g1, jac_to_affine

    if pt.infinity:
        return pt
    q = pt.curve.q
    k = int(k) % pt.curve.r
    key = ("g1", q, pt.x, pt.y)
    tbl = _COMB_CACHE.get(key)
    if tbl is None:
        tbl = comb_table_g1(q, (pt.x, pt.y))
        _COMB_CACHE[key] = tbl
    aff = jac_to_affine(q, comb_mul_g1(q, tbl, k))
    if aff is None:
        return PointG1(pt.curve, None, None)
    return PointG1(pt.curve, aff[0], aff[1])


def _fb_mul_g2(pt: PointG2, k: int) -> PointG2:
    from ..ec.jacobian import comb_mul_g2, comb_table_g2, jac2_to_affine
    from ..ec.tower import Fq2

    if pt.infinity or not hasattr(pt.x, "c0"):
        return pt * int(k)
    q = pt.curve.q
    beta = pt.x.ctx.beta
    k = int(k) % pt.curve.r
    key = ("g2", q, pt.x.c0, pt.x.c1, pt.y.c0, pt.y.c1)
    tbl = _COMB_CACHE.get(key)
    if tbl is None:
        tbl = comb_table_g2(
            q, beta, ((pt.x.c0, pt.x.c1), (pt.y.c0, pt.y.c1))
        )
        _COMB_CACHE[key] = tbl
    aff = jac2_to_affine(q, beta, comb_mul_g2(q, beta, tbl, k))
    if aff is None:
        return PointG2(pt.curve, None, None)
    return PointG2(
        pt.curve,
        Fq2(pt.x.ctx, aff[0][0], aff[0][1]),
        Fq2(pt.x.ctx, aff[1][0], aff[1][1]),
    )


def _jac_to_g1(curve: str, jac) -> PointG1:
    grp = g1_group(curve)
    jx, jy, jz = jac
    if jz == 0:
        return grp.zero()
    q = grp.q
    zi = pow(jz, -1, q)
    return PointG1(grp, jx * zi * zi % q, jy * zi * zi % q * zi % q)


def _jac_to_g2(curve: str, jac) -> PointG2:
    from ..ec.tower import Fq2

    grp = g2_group(curve)
    jx, jy, jz = jac
    if jz == (0, 0):
        return grp.zero()
    zf = Fq2(grp.tower, jz[0], jz[1])
    zi = zf.inv()
    zi2 = zi * zi
    return PointG2(
        grp,
        Fq2(grp.tower, jx[0], jx[1]) * zi2,
        Fq2(grp.tower, jy[0], jy[1]) * zi2 * zi,
    )


def _signed_digits_np(z_limbs: np.ndarray, W: int, c: int):
    """Host signed-digit decomposition: (W, m) |digit| and sign arrays.
    Mirrors kernels/msm_sorted._signed_digits exactly (c | 16 so no digit
    spans limbs); vectorized numpy, ~1 ms at 2^15."""
    m, nls = z_limbs.shape
    mask = np.uint32((1 << c) - 1)
    half = np.uint32(1 << (c - 1))
    full = np.uint32(1 << c)
    carry = np.zeros(m, np.uint32)
    digits = np.zeros((W, m), np.uint32)
    signs = np.zeros((W, m), np.uint32)
    for w in range(W):
        limb = (w * c) // 16
        sh = np.uint32((w * c) % 16)
        raw = (
            (z_limbs[:, limb] >> sh) & mask
            if limb < nls
            else np.zeros(m, np.uint32)
        )
        t = raw + carry
        neg = t >= half
        digits[w] = np.where(neg, full - t, t)
        signs[w] = neg
        carry = neg.astype(np.uint32)
    return digits, signs


def _window_nnz(z_limbs: np.ndarray, W: int, c: int) -> List[int]:
    """Exact per-window nonzero signed-digit counts of the witness."""
    digits, _ = _signed_digits_np(z_limbs, W, c)
    return [int(np.count_nonzero(digits[w])) for w in range(W)]


def _window_nnz_batch(Z_np: List[np.ndarray], W: int, c: int) -> np.ndarray:
    """Per-window nnz maxed over a batch of witnesses, in ONE vectorized
    pass (the per-witness loop cost ~60 ms at B=8; this is ~8 ms)."""
    stacked = np.concatenate(Z_np, axis=0)  # (B*m, nls)
    digits, _ = _signed_digits_np(stacked, W, c)
    B = len(Z_np)
    m = Z_np[0].shape[0]
    counts = np.count_nonzero(digits.reshape(W, B, m), axis=2)  # (W, B)
    return counts.max(axis=1)


_SPLIT_W0S = (0, 1, 2, 3, 4, 6, 8, 12, 16)
_SPLIT_W1S = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64)


def _sparse_split(z_limbs: np.ndarray, W: int, cfg, N: int):
    """Pick the (w0, w1, Ks) window split minimizing walked positions:
    windows [0, w0) walk all N sorted slots, windows [w0, w1) walk the
    last Ks >= max nnz, windows [w1, W) have NO nonzero digit at all and
    are skipped outright (their window sums are the identity, and the
    combine loop started at w1-1 is exact). Witnesses are mostly bits and
    small values, so window 0 is dense (every nonzero value's low digit),
    a few low windows are sparse, and the high windows are empty.
    Candidates are discrete so compiled program variants stay bounded."""
    return _split_from_nnz(_window_nnz(z_limbs, W, cfg.c), W, cfg, N)


def _split_from_nnz(nnz, W: int, cfg, N: int):
    floor = cfg.M1 * cfg.R

    def tier(mx):
        return min(N, max(floor, 1 << max(0, mx - 1).bit_length()))

    last = max((w for w in range(W) if nnz[w]), default=0) + 1
    w1 = next((c for c in _SPLIT_W1S if c >= last), W)
    w1 = min(w1, W)

    best = (W * N + 1, 0, N)
    for w0 in _SPLIT_W0S:
        if w0 > w1:
            break
        Ks = tier(max(nnz[w0:w1], default=1))
        cost = w0 * N + (w1 - w0) * Ks
        if cost < best[0]:
            best = (cost, w0, Ks)
    return best[1], w1, best[2]


# total sparse entries the native host path absorbs per witness; ~3 us
# per entry (C double-and-add at digit width), so 4096 entries cost a
# couple of ms across all four queries — vs a 4096-slot device walk FLOOR
# per sparse window (cfg.M1 * cfg.R) plus per-window merge/suffix fixed
# costs on the device side
_HOST_SPARSE_CAP = 4096

# witness-upload exception cap: values wider than one 16-bit limb ride a
# fixed-size (idx, rows) side channel; bit-decomposed circuits have a
# handful (sha256: ~30), so the upload shrinks from m*nl*2 bytes to
# m*2 + CAP*(4 + nl*2) — the axon tunnel makes host->device bytes a
# real per-proof cost. Witnesses with more wide values upload densely.
_ZSPARSE_CAP = 1024


def _z_upload_parts(z_np: np.ndarray, N: int):
    """(limb0 (N,) u16, idx (CAP,) i32, rows (CAP, nl) u16) sparse witness
    upload encoding, or None when too many wide values."""
    m, nl = z_np.shape
    wide = np.nonzero((z_np[:, 1:] != 0).any(axis=1))[0]
    if len(wide) > _ZSPARSE_CAP:
        return None
    limb0 = np.zeros(N, np.uint16)
    limb0[:m] = z_np[:, 0].astype(np.uint16)
    idx = np.full(_ZSPARSE_CAP, N, np.int32)  # N = out-of-bounds, dropped
    idx[: len(wide)] = wide
    rows = np.zeros((_ZSPARSE_CAP, nl), np.uint16)
    rows[: len(wide)] = z_np[wide].astype(np.uint16)
    return limb0, idx, rows


def _z_rebuild(parts, N: int, nl: int):
    """Device-side inverse of _z_upload_parts -> (N, nl) u32 limbs."""
    limb0, idx, rows = parts
    z = jnp.zeros((N, nl), jnp.uint32)
    z = z.at[:, 0].set(limb0.astype(jnp.uint32))
    return z.at[idx].set(rows.astype(jnp.uint32), mode="drop")


def _split_with_host(nnz: List[int], W: int, cfg, N: int, native_ok: bool):
    """Returns (w0, w1, Ks, hw0, hw1): (w0, w1, Ks) is the DEVICE window
    split (the _fused_prove_fn parameters), and [hw0, hw1) are the
    windows the native C host backend computes directly from the packed
    query rows (empty when hw0 == hw1). zkSNARK witnesses are mostly
    bits: beyond window 0 the per-window nonzero counts are tiny, far
    below the device walk's M1*R slot floor — the host absorbs every
    trailing window whose cumulative count fits _HOST_SPARSE_CAP, and
    the device split is then re-optimized over the remaining prefix
    (typically: window 0 alone, walked at its nnz tier, not N)."""
    last = max((w for w in range(W) if nnz[w]), default=0) + 1
    if native_ok:
        suffix = 0
        wh = last
        while wh > 1 and suffix + nnz[wh - 1] <= _HOST_SPARSE_CAP:
            suffix += nnz[wh - 1]
            wh -= 1
        # snap to the discrete candidate grid so compiled program
        # variants stay bounded (same grid as the device split)
        wh = next((c0 for c0 in _SPLIT_W0S if c0 >= wh), last)
        if wh < last:
            w0, w1, Ks = _split_from_nnz(nnz[:wh], wh, cfg, N)
            return w0, w1, Ks, wh, last
    w0, w1, Ks = _split_from_nnz(nnz, W, cfg, N)
    return w0, w1, Ks, 0, 0


def _host_sparse_windows(nf, nf2, pk, z_np, w0: int, w1: int, c: int):
    """Windows [w0, w1) of the four witness MSMs, computed natively on
    the host from the packed pk rows. Returns ([a, b1, l] per-window
    G1 jac lists, b2 per-window G2 jac list)."""
    digits, signs = _signed_digits_np(z_np, w1, c)
    g1_wins = [[], [], []]
    g2_wins = []
    queries = (pk.a_p128, pk.b1_p128, pk.l_p128)
    m = z_np.shape[0]
    for w in range(w0, w1):
        nz = np.nonzero(digits[w][:m])[0].astype(np.int32)
        dg = digits[w][nz]
        sg = signs[w][nz]
        for qi, q in enumerate(queries):
            g1_wins[qi].append(nf.sparse_window_g1(q, nz, dg, sg))
        g2_wins.append(nf2.sparse_window_g2(pk.b2_p128, nz, dg, sg))
    return g1_wins, g2_wins


def _combine_host_g1(nf, dev_jac, host_wins, w0: int, c: int):
    """dev_jac (= sum_{w<w0} 2^{cw} S_w) + 2^{c w0} * Horner(host_wins)."""
    if not host_wins:
        return dev_jac
    acc = (1, 1, 0)
    for S in reversed(host_wins):
        acc = nf.g1_add(nf.g1_shift(acc, c), S)
    return nf.g1_add(dev_jac, nf.g1_shift(acc, c * w0))


def _combine_host_g2(nf2, dev_jac, host_wins, w0: int, c: int):
    if not host_wins:
        return dev_jac
    acc = ((1, 0), (1, 0), (0, 0))
    for S in reversed(host_wins):
        acc = nf2.g2_add(nf2.g2_shift(acc, c), S)
    return nf2.g2_add(dev_jac, nf2.g2_shift(acc, c * w0))


_FUSED_JIT: Dict = {}


def _shared_h_cfg(cfg):
    """MSMConfig for the shared-bucket h walk: c=16 digits into one
    2^15-bucket space; lw2=1024 keeps the single-'window' merge and
    suffix stages at full 1024-lane occupancy."""
    from ..kernels.msm_sorted import MSMConfig

    return MSMConfig(c=16, M1=cfg.M1, R=cfg.R, lw2=1024, interpret=cfg.interpret)


def _corr_fast(f, p: int, corr_w, z_pad, C: int, chunk: int):
    """Dummy-correction weights · witness dot products (3 rows). The two
    elementwise multiplies route through the Pallas kernel on hardware
    (the XLA scan-CIOS pair cost ~10 ms of the fused program)."""
    if jax.default_backend() == "tpu":
        from ..kernels.pallas_field import emul, ereduce_wide

        r2 = jnp.broadcast_to(
            jnp.asarray(np.asarray(f.spec.r2_limbs, dtype=np.uint32)),
            z_pad.shape,
        )
        zm = emul(p, z_pad[None], r2)[0]
        prod = emul(p, corr_w, zm)
        s1 = ereduce_wide(
            p, jnp.sum(prod.reshape(3, C, chunk, -1), axis=2)
        )
        return f.from_mont_(ereduce_wide(p, jnp.sum(s1, axis=1)[None])[0])
    zm = f.to_mont_(z_pad)
    prod = f.mul_(corr_w, jnp.broadcast_to(zm[None], corr_w.shape))
    s1 = f.reduce_wide_(jnp.sum(prod.reshape(3, C, chunk, -1), axis=2))
    return f.from_mont_(f.reduce_wide_(jnp.sum(s1, axis=1)))


def _fused_prove_fn(curve: str, N: int, n: int, W: int, cfg, fold: bool, w0: int, w1: int, Ks: int, h16: bool = False, zsparse: bool = False):
    """ONE jitted program for the whole prove compute: h pipeline, two
    sorted-MSM plans (witness + h scalars), the three witness G1 MSMs as
    a scan over stacked queries (one traced copy), the dense h G1 MSM,
    the G2 MSM, and the dummy corrections. A single dispatch matters
    doubly on the axon TPU tunnel, where each DEPENDENT jit call costs a
    ~25-95 ms round trip — the 9-call pipeline spent more time on the
    wire than in the MXU/VPU.

    (w0, w1, Ks) is the SPARSE window split for the witness plan:
    windows [0, w0) walk all N sorted positions, windows [w0, w1) walk
    only the last Ks, windows [w1, W) are empty and skipped — exact
    because the host counts per-window nonzero signed digits (zkSNARK
    witnesses are mostly bits and small values). The witness MSM outputs
    therefore carry only w1 window sums; the host combine starts at
    window w1-1. The h scalars are uniform, so the h MSM stays dense."""
    mvk = _matvec_kind()
    key = (curve, N, n, W, cfg, fold, w0, w1, Ks, h16, zsparse, mvk)
    fn = _FUSED_JIT.get(key)
    if fn is not None:
        return fn

    from ..kernels.msm_sorted import (
        _msm_from_plan,
        _msm_plan,
        _msm_plan_shared,
        _msm_plan_split,
        shared_window_count,
    )
    from ..fields.jfield import field_ops

    p = P.SCALAR_FIELDS[curve].p
    q = P.BASE_FIELDS[curve].p
    beta = g2_group(curve).tower.beta - q
    f = field_ops(p)
    _h_stage(curve, n)  # populate _H_RAW
    h_raw = _H_RAW[(curve, n, "walk") if mvk == "walk" else (curve, n)]
    chunk = min(N, 1 << 15)  # u32 lazy-sum headroom (16-bit limb terms)
    C = -(-N // chunk)
    cfgH = _shared_h_cfg(cfg)
    Wc = shared_window_count(p, 16)

    def z_msm(P128_i, plan_d, plan_s, b):
        """Witness-scalar MSM over the split plan -> (w1, nl_eff) sums."""
        parts = []
        if plan_d is not None:
            out_d, _ = _msm_from_plan(
                q, w0, N, cfg, P128_i, plan_d, True, beta=b, fold=fold
            )
            parts.append(out_d)
        if plan_s is not None:
            out_s, _ = _msm_from_plan(
                q, w1 - w0, N, cfg, P128_i, plan_s, True, beta=b, fold=fold
            )
            parts.append(out_s)
        return tuple(
            jnp.concatenate([pt[i] for pt in parts], axis=0) for i in range(3)
        )

    def h_msm(qh, h_pad):
        """h-coefficient MSM: shared-bucket c=16 over the pre-shifted
        query (ONE window sum) when available, else per-window dense."""
        if h16:
            plan_h = _msm_plan_shared(Wc, N, cfgH, h_pad)
            out_h, _ = _msm_from_plan(
                q, 1, Wc * N, cfgH, qh, plan_h, True, beta=None, fold=fold
            )
            return out_h
        plan_h = _msm_plan(W, N, cfg, h_pad)
        out_h, _ = _msm_from_plan(
            q, W, N, cfg, qh, plan_h, True, beta=None, fold=fold
        )
        return out_h

    def fused(mv, z_in, qg1, qh, qb2, corr_w):
        # witness limbs arrive as u16 — sparse (limb0 + wide-value
        # exceptions) or dense — to cut the axon tunnel transfer
        if zsparse:
            z_pad = _z_rebuild(z_in, N, f.nl)
        else:
            z_pad = z_in.astype(jnp.uint32)
        h = h_raw(*mv, z_pad[None])[0]
        h_pad = jnp.pad(h[: n - 1], ((0, N - (n - 1)), (0, 0)))
        plan_d, plan_s = _msm_plan_split(w1, N, cfg, z_pad, w0, Ks)

        if os.environ.get("ZOKRATES_TPU_FUSED_EAGER") == "1":
            gl = [
                z_msm(qg1[i], plan_d, plan_s, None)
                for i in range(qg1.shape[0])
            ]
            g1outs = tuple(jnp.stack([g[i] for g in gl]) for i in range(3))
        else:

            def body(carry, P128_i):
                return carry, z_msm(P128_i, plan_d, plan_s, None)

            _, g1outs = jax.lax.scan(body, 0, qg1)
        out_h = h_msm(qh, h_pad)
        out_b2 = z_msm(qb2, plan_d, plan_s, beta)

        corr = _corr_fast(f, p, corr_w, z_pad, C, chunk)
        return g1outs, out_h, out_b2, corr

    # ZOKRATES_TPU_FUSED_EAGER=1: run the pipeline op-by-op instead of as
    # one jitted program — XLA:CPU takes hours to compile the fused graph
    # with interpret-mode Pallas calls inlined, while eager interpret
    # executes it in minutes (CPU validation only; hardware always jits)
    if os.environ.get("ZOKRATES_TPU_FUSED_EAGER") == "1":
        return fused
    fn = jax.jit(fused)
    _FUSED_JIT[key] = fn
    return fn


_FUSED_BATCH_JIT: Dict = {}


def _fused_prove_batch_fn(
    curve: str, N: int, n: int, W: int, cfg, fold: bool, w0: int, w1: int,
    Ks: int, B: int, h16: bool = False, zsparse: bool = False,
):
    """Batched fused prove program: B witnesses of one circuit in ONE
    device dispatch (the multi-proof batch axis, SURVEY §2.5 row 4).

    Structure: the h pipelines run vmapped over the batch first (the NTT
    stage ops broadcast, so B proofs cost one XLA op per butterfly stage
    instead of B), the per-witness sorted-MSM plans are built vmapped
    (one batched lax.sort), then a lax.scan over the batch axis runs the
    per-proof MSM walks — the Pallas walk kernels are traced once and
    shared with the single-proof program's cache. Window sums for all B
    proofs come back in one fetch; the native host tail finishes each
    proof in ~2 ms."""
    mvk = _matvec_kind()
    key = (curve, N, n, W, cfg, fold, w0, w1, Ks, B, h16, zsparse, mvk)
    fn = _FUSED_BATCH_JIT.get(key)
    if fn is not None:
        return fn

    from ..fields.jfield import field_ops
    from ..kernels.msm_sorted import (
        _msm_from_plan,
        _msm_plan,
        _msm_plan_shared,
        _msm_plan_split,
        shared_window_count,
    )

    p = P.SCALAR_FIELDS[curve].p
    q = P.BASE_FIELDS[curve].p
    beta = g2_group(curve).tower.beta - q
    f = field_ops(p)
    _h_stage(curve, n)  # populate _H_RAW
    h_raw = _H_RAW[(curve, n, "walk") if mvk == "walk" else (curve, n)]
    chunk = min(N, 1 << 15)
    C = -(-N // chunk)
    cfgH = _shared_h_cfg(cfg)
    Wc = shared_window_count(p, 16)

    def z_msm(P128_i, plan_d, plan_s, b):
        parts = []
        if plan_d is not None:
            out_d, _ = _msm_from_plan(
                q, w0, N, cfg, P128_i, plan_d, True, beta=b, fold=fold
            )
            parts.append(out_d)
        if plan_s is not None:
            out_s, _ = _msm_from_plan(
                q, w1 - w0, N, cfg, P128_i, plan_s, True, beta=b, fold=fold
            )
            parts.append(out_s)
        return tuple(
            jnp.concatenate([pt[i] for pt in parts], axis=0) for i in range(3)
        )

    eager = os.environ.get("ZOKRATES_TPU_FUSED_EAGER") == "1"

    def make_plan_h(hb):
        if h16:
            return _msm_plan_shared(Wc, N, cfgH, hb)
        return _msm_plan(W, N, cfg, hb)

    def run_h(qh, plan_h):
        if h16:
            out_h, _ = _msm_from_plan(
                q, 1, Wc * N, cfgH, qh, plan_h, True, beta=None, fold=fold
            )
        else:
            out_h, _ = _msm_from_plan(
                q, W, N, cfg, qh, plan_h, True, beta=None, fold=fold
            )
        return out_h

    def corr_b(corr_w, zb):
        return _corr_fast(f, p, corr_w, zb, C, chunk)

    def fused(mv, Z_in, qg1, qh, qb2, corr_w):
        # witness limbs arrive as u16 — sparse or dense (see single fn)
        if zsparse:
            if eager:
                Z_pad = jnp.stack(
                    [
                        _z_rebuild(tuple(a[b] for a in Z_in), N, f.nl)
                        for b in range(B)
                    ]
                )
            else:
                Z_pad = jax.vmap(lambda pp: _z_rebuild(pp, N, f.nl))(Z_in)
        else:
            Z_pad = Z_in.astype(jnp.uint32)
        # (B, n, nl) h coefficients; the NTT stack batches across proofs
        H = h_raw(*mv, Z_pad)
        H_pad = jnp.pad(H[:, : n - 1], ((0, 0), (0, N - (n - 1)), (0, 0)))

        if eager:
            # op-by-op CPU validation path: Python loops instead of
            # scan/vmap (their bodies would XLA-compile the inlined
            # interpret-mode Pallas calls — hours on XLA:CPU)
            G1o_l, Ho_l, B2o_l, corr_l = [], [], [], []
            for b in range(B):
                plan_d, plan_s = _msm_plan_split(w1, N, cfg, Z_pad[b], w0, Ks)
                plan_h = make_plan_h(H_pad[b])
                g1outs = [
                    z_msm(qg1[i], plan_d, plan_s, None)
                    for i in range(qg1.shape[0])
                ]
                G1o_l.append(
                    tuple(
                        jnp.stack([g[i] for g in g1outs]) for i in range(3)
                    )
                )
                Ho_l.append(run_h(qh, plan_h))
                B2o_l.append(z_msm(qb2, plan_d, plan_s, beta))
                corr_l.append(corr_b(corr_w, Z_pad[b]))
            G1o = tuple(jnp.stack([g[i] for g in G1o_l]) for i in range(3))
            Ho = tuple(jnp.stack([h_[i] for h_ in Ho_l]) for i in range(3))
            B2o = tuple(jnp.stack([b_[i] for b_ in B2o_l]) for i in range(3))
            corr = jnp.stack(corr_l)
            return G1o, Ho, B2o, corr

        plans_w = jax.vmap(lambda zb: _msm_plan_split(w1, N, cfg, zb, w0, Ks))(
            Z_pad
        )
        plans_h = jax.vmap(make_plan_h)(H_pad)

        def per_b(carry, xs):
            (plan_d, plan_s), plan_h = xs

            def body(c2, P128_i):
                return c2, z_msm(P128_i, plan_d, plan_s, None)

            _, g1outs = jax.lax.scan(body, 0, qg1)
            out_h = run_h(qh, plan_h)
            out_b2 = z_msm(qb2, plan_d, plan_s, beta)
            return carry, (g1outs, out_h, out_b2)

        _, (G1o, Ho, B2o) = jax.lax.scan(per_b, 0, (plans_w, plans_h))
        corr = jax.vmap(lambda zb: corr_b(corr_w, zb))(Z_pad)
        return G1o, Ho, B2o, corr

    if eager:
        return fused
    fn = jax.jit(fused)
    _FUSED_BATCH_JIT[key] = fn
    return fn


def _witness_limbs(r1cs: R1CS, witness: Witness, p: int, nls: int) -> np.ndarray:
    """(m, nls) u32 canonical witness limb array.

    Fast path: witnesses read from disk carry a numpy sidecar
    (Witness._arr_vars/_arr_vals); the full assignment is then two numpy
    gathers (~0.3 ms at 27k variables) instead of a 27k-element Python
    int round trip (~8 ms). Falls back to the int path for interpreter-
    built witnesses, foreign layouts, or any value >= p."""
    va = getattr(witness, "_arr_vars", None)
    vals = getattr(witness, "_arr_vals", None)

    def slow():
        z = [v % p for v in r1cs.full_assignment(witness)]
        return np.asarray(ints_to_limbs(z, nls))

    if va is None or vals is None or vals.shape[1] != 2 * nls:
        return slow()
    # the (dense, rows) mapping lives ON the r1cs object (an id()-keyed
    # dict would alias a new r1cs allocated at a recycled address)
    cached = getattr(r1cs, "_wlimb_map", None)
    if cached is None or not np.array_equal(cached[0], va):
        ir_vars = np.fromiter(r1cs.ir_to_dense.keys(), dtype=np.int64)
        dense = np.fromiter(r1cs.ir_to_dense.values(), dtype=np.int64)
        rows = np.searchsorted(va, ir_vars)
        if np.any(rows >= len(va)) or not np.array_equal(va[rows], ir_vars):
            return slow()  # witness is missing mapped variables
        from ..fields.limbs import int_to_limbs

        p16 = int_to_limbs(p, nls)
        cached = (va.copy(), dense, rows, p16)
        r1cs._wlimb_map = cached
    _, dense, rows, p16 = cached
    w16 = np.ascontiguousarray(vals).view("<u2").astype(np.uint32)
    # exact range check vs p (most-significant-limb-first lexicographic)
    eq = np.ones(w16.shape[0], dtype=bool)
    ge = np.zeros(w16.shape[0], dtype=bool)
    for i in range(nls - 1, -1, -1):
        gt = eq & (w16[:, i] > p16[i])
        lt = eq & (w16[:, i] < p16[i])
        ge |= gt
        eq &= ~(gt | lt)
    if np.any(ge | eq):
        return slow()  # non-canonical value present
    m = r1cs.num_variables
    z = np.zeros((m, nls), np.uint32)
    z[0, 0] = 1
    z[dense] = w16[rows]
    return z


def _public_inputs_json(r1cs: R1CS, witness: Witness, curve: str):
    """Proof JSON public inputs (dense instance slots 1..ni-1)."""
    p = P.SCALAR_FIELDS[curve].p
    inv = getattr(r1cs, "_dense_inv", None)
    if inv is None:
        inv = {d: v for v, d in r1cs.ir_to_dense.items()}
        r1cs._dense_inv = inv
    return [
        fr_to_json(witness[inv[i]] % p, curve)
        for i in range(1, r1cs.num_instance)
    ]


def _timer():
    """ZOKRATES_TPU_PROVE_TIMING=1 -> per-stage stderr timings."""
    if os.environ.get("ZOKRATES_TPU_PROVE_TIMING") != "1":
        return lambda label: None
    import sys
    import time

    state = {"t": time.perf_counter()}

    def mark(label):
        now = time.perf_counter()
        print(f"[prove] {label}: {(now - state['t']) * 1e3:.1f} ms", file=sys.stderr)
        state["t"] = now

    return mark


def _neg_jac(q, jac):
    x, y, z = jac
    return (x, (q - y) % q, z)


def _neg_jac2(q, jac):
    x, y, z = jac
    return (x, ((q - y[0]) % q, (q - y[1]) % q), z)


def _native_pair(curve):
    """(Fq ctx, Fq2 ctx) native contexts, or (None, None) if unavailable."""
    from ..native import field_for as _nfield

    q = P.BASE_FIELDS[curve].p
    nf = _nfield(q)
    if nf is None:
        return None, None
    nf2 = _nfield(q, g2_group(curve).tower.beta)
    if nf2 is None:
        return None, None
    return nf, nf2


def _prove_core_sorted(curve, pk, dev: R1CSDevice, z_limbs, m, n, ni, r, s):
    """Fused sorted-MSM prove core: ONE device dispatch for h + plans +
    MSMs + corrections (see _fused_prove_fn), one host sync, then the
    host window combine, dummy-correction subtraction, and the A/B/C
    randomization tail. Returns final (A, B2, C) proof points.

    The host epilogue runs in the native C backend when available
    (zokrates_tpu/native: ~40 us/MSM combine + ~0.2 ms/scalar mult vs
    1-4 ms each in Python bigints — the Python tail alone costs more
    than the device compute at 2^15); the Python path below is the
    fallback and cross-check oracle."""
    from ..kernels.msm_sorted import (
        _fold_override,
        _windows,
        combine_windows,
        default_config,
    )

    p = P.SCALAR_FIELDS[curve].p
    q = P.BASE_FIELDS[curve].p
    g2grp = g2_group(curve)
    beta = g2grp.tower.beta - q

    N = max(_msm_tier(m), _msm_tier(n - 1))
    cfg = default_config(N, interpret=jax.default_backend() != "tpu")
    need = cfg.M1 * cfg.R
    if N % need:
        N = -(-N // need) * need
    W = _windows(p, cfg.c)
    fold = _fold_override(cfg)

    use_h16 = _use_h16(pk, cfg, p, N)

    d = pk.dev()
    if "fused_g1" not in d:
        d["fused_g1"] = jnp.asarray(
            np.stack([
                _pad_rows(pk.a_p128, N),
                _pad_rows(pk.b1_p128, N),
                _pad_rows(pk.l_p128, N),
            ])
        )
        d["fused_b2"] = jnp.asarray(_pad_rows(pk.b2_p128, N))
        d["fused_corr"] = jnp.asarray(
            np.pad(pk.corr_w, ((0, 0), (0, N - m), (0, 0)))
        )
    hkey = "fused_h16" if use_h16 else "fused_h"
    if hkey not in d:
        d[hkey] = jnp.asarray(
            pk.h16_p128 if use_h16 else _pad_rows(pk.h_p128, N)
        )

    mark = _timer()
    nf, nf2 = _native_pair(curve)
    z_np = np.asarray(z_limbs)
    nnz = _window_nnz(z_np, W, cfg.c)
    w0, w1, Ks, hw0, hw1 = _split_with_host(nnz, W, cfg, N, nf is not None)
    mark("sparse split (host digits)")
    parts = _z_upload_parts(z_np, N)
    if parts is not None:
        z_in = tuple(jnp.asarray(a) for a in parts)
    else:
        z_in = jnp.asarray(
            np.pad(z_np, ((0, N - m), (0, 0))).astype(np.uint16)
        )
    mark("z upload")
    fn = _fused_prove_fn(
        curve, N, n, W, cfg, fold, w0, w1, Ks, use_h16, parts is not None
    )
    g1outs, out_h, out_b2, corr = fn(
        _matvec_args(dev, _matvec_kind()), z_in, d["fused_g1"], d[hkey],
        d["fused_b2"],
        d["fused_corr"],
    )
    mark("fused dispatch")

    # host sparse windows overlap the device walk (dispatch is async)
    host_g1 = host_g2 = None
    if hw1 > hw0:
        host_g1, host_g2 = _host_sparse_windows(
            nf, nf2, pk, z_np, hw0, hw1, cfg.c
        )
        mark("host sparse windows")

    # single sync point: fetch window sums + corrections together
    g1w, wh, w2, corr_np = jax.device_get((g1outs, out_h, out_b2, corr))
    mark("device wait+fetch")
    ca, cb, cl = limbs_to_ints(np.asarray(corr_np))

    wh_count = 1 if use_h16 else W
    if nf is not None:
        out = _finish_native(
            curve, pk, nf, nf2, g1w, wh, w2, (ca, cb, cl), w1, wh_count,
            cfg, r, s, host_g1, host_g2, hw0,
        )
        mark("host combine+tail (native)")
        return out
    out = _finish_python(
        curve, pk, g1w, wh, w2, (ca, cb, cl), w1, wh_count, cfg, r, s, beta
    )
    mark("host combine+tail")
    return out


def _use_h16(pk, cfg, p: int, N: int) -> bool:
    """Shared-bucket h path: hardware configs only (the interpret tests
    run the per-window dense form), and only when the pk carries the
    shifted query at exactly this prover's padded tier."""
    if cfg.interpret or pk.h16_p128 is None:
        return False
    from ..kernels.msm_sorted import shared_window_count

    return pk.h16_p128.shape[0] == shared_window_count(p, 16) * N


def _finish_native(
    curve, pk, nf, nf2, g1w, wh, w2, corrs, w1, W, cfg, r, s,
    host_g1=None, host_g2=None, hw0=0,
):
    """Window sums + corrections -> final (A, B2, C) proof points, all
    host math in the native C backend (Jacobian; 3 affine conversions).
    w1 is the DEVICE window count; host_g1/host_g2 (optional) carry the
    natively-computed sparse windows [hw0, hw0+len) per query."""
    p = P.SCALAR_FIELDS[curve].p
    q = P.BASE_FIELDS[curve].p
    ca, cb, cl = corrs
    g1grp = g1_group(curve)
    g2grp = g2_group(curve)
    g1 = g1grp.generator()
    g2 = g2grp.generator()
    gj = (g1.x, g1.y, 1)
    g2j = ((g2.x.c0, g2.x.c1), (g2.y.c0, g2.y.c1), (1, 0))

    def comb1(i):
        dev = nf.combine_windows(g1w[0][i], g1w[1][i], g1w[2][i], w1, cfg.c)
        if host_g1 is not None:
            dev = _combine_host_g1(nf, dev, host_g1[i], hw0, cfg.c)
        return dev

    ja = nf.g1_add(comb1(0), _neg_jac(q, nf.g1_mul(gj, ca)))
    jb1 = nf.g1_add(comb1(1), _neg_jac(q, nf.g1_mul(gj, cb)))
    jl = nf.g1_add(comb1(2), _neg_jac(q, nf.g1_mul(gj, cl)))
    jh = nf.combine_windows(wh[0], wh[1], wh[2], W, cfg.c)
    jb2_dev = nf2.combine_windows2(w2[0], w2[1], w2[2], w1, cfg.c)
    if host_g2 is not None:
        jb2_dev = _combine_host_g2(nf2, jb2_dev, host_g2, hw0, cfg.c)
    jb2 = nf2.g2_add(jb2_dev, _neg_jac2(q, nf2.g2_mul(g2j, cb)))

    al, b1p, dl = pk.alpha_g1, pk.beta_g1, pk.delta_g1
    dj = (dl.x, dl.y, 1)
    A = nf.g1_add(nf.g1_add((al.x, al.y, 1), ja), nf.g1_mul(dj, r))
    B1 = nf.g1_add(nf.g1_add((b1p.x, b1p.y, 1), jb1), nf.g1_mul(dj, s))
    b2c, d2c = pk.beta_g2, pk.delta_g2
    b2j = ((b2c.x.c0, b2c.x.c1), (b2c.y.c0, b2c.y.c1), (1, 0))
    d2j = ((d2c.x.c0, d2c.x.c1), (d2c.y.c0, d2c.y.c1), (1, 0))
    B2 = nf2.g2_add(nf2.g2_add(b2j, jb2), nf2.g2_mul(d2j, s))
    rs = r * s % p
    C = nf.g1_add(
        nf.g1_add(jl, jh),
        nf.g1_add(
            nf.g1_mul(A, s),
            nf.g1_add(nf.g1_mul(B1, r), _neg_jac(q, nf.g1_mul(dj, rs))),
        ),
    )
    aA = nf.g1_to_affine(A)
    aC = nf.g1_to_affine(C)
    aB2 = nf2.g2_to_affine(B2)
    A_pt = g1grp.zero() if aA is None else PointG1(g1grp, aA[0], aA[1])
    C_pt = g1grp.zero() if aC is None else PointG1(g1grp, aC[0], aC[1])
    if aB2 is None:
        B2_pt = g2grp.zero()
    else:
        from ..ec.tower import Fq2

        B2_pt = PointG2(
            g2grp,
            Fq2(g2grp.tower, aB2[0][0], aB2[0][1]),
            Fq2(g2grp.tower, aB2[1][0], aB2[1][1]),
        )
    return A_pt, B2_pt, C_pt


def _prove_core_sorted_batch(curve, pk, dev: R1CSDevice, Z_list, m, n, ni, rs_list):
    """Batched fused prove core: B witnesses -> B (A, B2, C) point triples
    via one device dispatch (_fused_prove_batch_fn) + per-proof host tails.

    The sparse window split must hold for EVERY witness in the batch, so
    the per-window nonzero counts are aggregated elementwise-max before
    the split choice (same-circuit witnesses share the bits-heavy shape,
    so the union split stays tight)."""
    from ..kernels.msm_sorted import _fold_override, _windows, default_config

    p = P.SCALAR_FIELDS[curve].p
    q = P.BASE_FIELDS[curve].p
    g2grp = g2_group(curve)
    beta = g2grp.tower.beta - q
    B = len(Z_list)

    N = max(_msm_tier(m), _msm_tier(n - 1))
    cfg = default_config(N, interpret=jax.default_backend() != "tpu")
    need = cfg.M1 * cfg.R
    if N % need:
        N = -(-N // need) * need
    W = _windows(p, cfg.c)
    fold = _fold_override(cfg)

    use_h16 = _use_h16(pk, cfg, p, N)

    d = pk.dev()
    if "fused_g1" not in d:
        d["fused_g1"] = jnp.asarray(
            np.stack([
                _pad_rows(pk.a_p128, N),
                _pad_rows(pk.b1_p128, N),
                _pad_rows(pk.l_p128, N),
            ])
        )
        d["fused_b2"] = jnp.asarray(_pad_rows(pk.b2_p128, N))
        d["fused_corr"] = jnp.asarray(
            np.pad(pk.corr_w, ((0, 0), (0, N - m), (0, 0)))
        )
    hkey = "fused_h16" if use_h16 else "fused_h"
    if hkey not in d:
        d[hkey] = jnp.asarray(
            pk.h16_p128 if use_h16 else _pad_rows(pk.h_p128, N)
        )

    mark = _timer()
    nf, nf2 = _native_pair(curve)
    Z_np = [np.asarray(zl) for zl in Z_list]
    nnz = _window_nnz_batch(Z_np, W, cfg.c)
    w0, w1, Ks, hw0, hw1 = _split_with_host(
        [int(v) for v in nnz], W, cfg, N, nf is not None
    )
    mark("sparse split (host digits)")
    parts_list = [_z_upload_parts(z, N) for z in Z_np]
    if all(pp is not None for pp in parts_list):
        Z_in = tuple(
            jnp.asarray(np.stack([pp[i] for pp in parts_list]))
            for i in range(3)
        )
        zsparse = True
    else:
        Z_in = jnp.asarray(
            np.stack(
                [np.pad(z, ((0, N - m), (0, 0))) for z in Z_np]
            ).astype(np.uint16)
        )
        zsparse = False
    mark("z upload")
    fn = _fused_prove_batch_fn(
        curve, N, n, W, cfg, fold, w0, w1, Ks, B, use_h16, zsparse
    )
    G1o, Ho, B2o, corr = fn(
        _matvec_args(dev, _matvec_kind()), Z_in, d["fused_g1"], d[hkey],
        d["fused_b2"],
        d["fused_corr"],
    )
    mark("fused dispatch")

    # per-proof host sparse windows overlap the device batch walk
    hosts = [None] * B
    if hw1 > hw0:
        hosts = [
            _host_sparse_windows(nf, nf2, pk, z, hw0, hw1, cfg.c)
            for z in Z_np
        ]
        mark("host sparse windows x B")

    g1w, wh, w2, corr_np = jax.device_get((G1o, Ho, B2o, corr))
    mark("device wait+fetch")

    def finish(b):
        ca, cb, cl = limbs_to_ints(np.asarray(corr_np[b]))
        r, s = rs_list[b]
        g1w_b = (g1w[0][b], g1w[1][b], g1w[2][b])
        wh_b = (wh[0][b], wh[1][b], wh[2][b])
        w2_b = (w2[0][b], w2[1][b], w2[2][b])
        if nf is not None:
            hg1, hg2 = hosts[b] if hosts[b] is not None else (None, None)
            return _finish_native(
                curve, pk, nf, nf2, g1w_b, wh_b, w2_b, (ca, cb, cl),
                w1, (1 if use_h16 else W), cfg, r, s, hg1, hg2, hw0,
            )
        return _finish_python(
            curve, pk, g1w_b, wh_b, w2_b, (ca, cb, cl), w1,
            (1 if use_h16 else W), cfg, r, s, beta,
        )

    if nf is not None and B > 1:
        # the native C tail releases the GIL per call: thread the per-proof
        # finishes (~5 ms each serial; the ctx is const after init)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(B, 8)) as ex:
            outs = list(ex.map(finish, range(B)))
    else:
        outs = [finish(b) for b in range(B)]
    mark("host combine+tail x B")
    return outs


def _finish_python(curve, pk, g1w, wh, w2, corrs, w1, W, cfg, r, s, beta):
    """Pure-Python fallback of _finish_native (cross-check oracle)."""
    from ..kernels.msm_sorted import combine_windows

    p = P.SCALAR_FIELDS[curve].p
    q = P.BASE_FIELDS[curve].p
    ca, cb, cl = corrs
    g1 = g1_group(curve).generator()
    g2 = g2_group(curve).generator()

    def g1_res(i):
        # witness MSM sums stop at w1 (empty top windows contribute the
        # identity; starting the combine at w1-1 is exact)
        return _jac_to_g1(
            curve, combine_windows(q, p, (g1w[0][i], g1w[1][i], g1w[2][i]), w1, cfg)
        )

    a_acc = g1_res(0) - _fb_mul_g1(g1, ca)
    b1_acc = g1_res(1) - _fb_mul_g1(g1, cb)
    l_acc = g1_res(2) - _fb_mul_g1(g1, cl)
    h_acc = _jac_to_g1(curve, combine_windows(q, p, wh, W, cfg))
    b2_acc = _jac_to_g2(
        curve, combine_windows(q, p, w2, w1, cfg, beta=beta)
    ) - _fb_mul_g2(g2, cb)
    return _randomize_tail(curve, pk, a_acc, b1_acc, b2_acc, l_acc, h_acc, r, s)


def _randomize_tail(curve, pk, a_acc, b1_acc, b2_acc, l_acc, h_acc, r, s):
    """Python-point randomization tail (fallback + XLA-backend path)."""
    p = P.SCALAR_FIELDS[curve].p
    delta_g1 = pk.delta_g1
    A = pk.alpha_g1 + a_acc + _fb_mul_g1(delta_g1, r)
    B1 = pk.beta_g1 + b1_acc + _fb_mul_g1(delta_g1, s)
    B2 = pk.beta_g2 + b2_acc + _fb_mul_g2(pk.delta_g2, s)
    rs = r * s % p
    C = l_acc + h_acc + A * s + B1 * r - _fb_mul_g1(delta_g1, rs)
    return A, B2, C


def prove(r1cs: R1CS, pk: ProvingKey, witness: Witness, rng=None) -> Proof:
    curve = r1cs.curve
    p = P.SCALAR_FIELDS[curve].p
    rand = rng or (lambda: secrets.randbelow(p))
    g1grp = g1_group(curve)

    mark = _timer()
    n = pk.domain_size
    ni = pk.num_instance
    nls = n_limbs(p)
    z_limbs = _witness_limbs(r1cs, witness, p, nls)
    m = z_limbs.shape[0]
    mark("witness host prep")

    dev = _r1cs_device(r1cs, n)

    r, s = rand(), rand()

    if _msm_backend() == "sorted" and pk.b2_p128 is not None:
        A, B2, C = _prove_core_sorted(
            curve, pk, dev, z_limbs, m, n, ni, r, s
        )
        mark("accumulators")
        inputs = _public_inputs_json(r1cs, witness, curve)
        proof = Proof(
            "g16",
            curve,
            {
                "a": g1_to_json(A, curve),
                "b": g2_to_json(B2, curve),
                "c": g1_to_json(C, curve),
            },
            inputs,
        )
        mark("json tail")
        return proof
    else:
        # XLA Pippenger path (CPU tests): masks zero the dummy-slot scalars
        z_can = jnp.asarray(z_limbs)
        h_can = _h_stage(curve, n)(*_coo_args(dev), z_can)[: n - 1]
        d = pk.dev()
        tier_m = _msm_tier(m)
        tier_h = _msm_tier(n - 1)
        for key, src, tier in (
            ("a_pad", pk.a_p128, tier_m),
            ("b1_pad", pk.b1_p128, tier_m),
            ("h_pad", pk.h_p128, tier_h),
            ("l_pad", pk.l_p128, tier_m),
            ("b2x_pad", pk.b2_x, tier_m),
            ("b2y_pad", pk.b2_y, tier_m),
        ):
            if key not in d:
                d[key] = jnp.asarray(_pad_rows(src, tier))

        a_acc = _msm_packed_g1(curve, d["a_pad"], z_can, d["a_mask"])
        b1_acc = _msm_packed_g1(curve, d["b1_pad"], z_can, d["b1_mask"])
        b2_acc = _msm_dev_g2(curve, d["b2x_pad"], d["b2y_pad"], z_can, d["b2_mask"])
        l_acc = _msm_packed_g1(curve, d["l_pad"], z_can, d["l_mask"])
        h_acc = _msm_packed_g1(curve, d["h_pad"], h_can)

    A, B2, C = _randomize_tail(curve, pk, a_acc, b1_acc, b2_acc, l_acc, h_acc, r, s)

    inputs = _public_inputs_json(r1cs, witness, curve)
    proof = Proof(
        "g16",
        curve,
        {
            "a": g1_to_json(A, curve),
            "b": g2_to_json(B2, curve),
            "c": g1_to_json(C, curve),
        },
        inputs,
    )
    mark("randomize+json tail")
    return proof


# ---------------------------------------------------------------------------
# Multi-proof batch axis (SURVEY §2.5 row 4)
# ---------------------------------------------------------------------------

_H_BATCH_JIT: Dict = {}
_MSM_BATCH_JIT: Dict = {}


def _h_stage_batch(curve: str, n: int):
    """Batched h pipeline: (B, m, nl) witness batch -> (B, n, nl) h coeffs.

    The raw pipeline is natively batched (one stacked NTT for all 3B
    transforms), so B proofs share one device op per stage — the
    TPU-native answer to the reference's per-proof rayon loop."""
    key = (curve, n)
    fn = _H_BATCH_JIT.get(key)
    if fn is not None:
        return fn
    _h_stage(curve, n)  # populate _H_RAW
    fn = jax.jit(_H_RAW[(curve, n)])
    _H_BATCH_JIT[key] = fn
    return fn


def _msm_batch(ops, c: int):
    """Batched MSM: fixed points, (B, N, nl) scalars -> (B,) Jacobian points.

    vmap over the scalar axis only — bucket scatters and window folds batch
    on device; the point stream (the HBM-heavy operand) is read once per
    window for all B proofs."""
    from functools import partial as _partial

    from ..kernels.msm import msm

    key = (ops.key, c)
    fn = _MSM_BATCH_JIT.get(key)
    if fn is None:
        fn = jax.jit(jax.vmap(_partial(msm, ops, c=c), in_axes=(None, None, 0)))
        _MSM_BATCH_JIT[key] = fn
    return fn


def prove_batch(
    r1cs: R1CS, pk: ProvingKey, witnesses: Sequence[Witness], rng=None
) -> List[Proof]:
    """Prove B witnesses of one circuit in a single batched device pipeline.

    Equivalent to [prove(r1cs, pk, w) for w in witnesses] (each proof has
    fresh r/s randomizers and verifies independently) but all matvecs,
    NTTs and MSMs carry a leading batch axis — amortizing point-stream
    reads and kernel dispatches across proofs (BASELINE config 5, the
    batch-proving workload the reference covers one-at-a-time via
    zokrates_ark/src/groth16.rs:21-52)."""
    curve = r1cs.curve
    p = P.SCALAR_FIELDS[curve].p
    rand = rng or (lambda: secrets.randbelow(p))

    n = pk.domain_size
    ni = pk.num_instance
    nls = n_limbs(p)
    B = len(witnesses)
    if B == 0:
        return []

    Z_list = [_witness_limbs(r1cs, w, p, nls) for w in witnesses]
    m = Z_list[0].shape[0]

    if _msm_backend() == "sorted" and pk.b2_p128 is not None:
        # fused sorted-MSM batch path (TPU): one device dispatch for all
        # B proofs, native host tails
        dev = _r1cs_device(r1cs, n)
        rs_list = [(rand(), rand()) for _ in range(B)]
        triples = _prove_core_sorted_batch(
            curve, pk, dev, Z_list, m, n, ni, rs_list
        )
        proofs = []
        for b, (A, B2, C) in enumerate(triples):
            inputs = _public_inputs_json(r1cs, witnesses[b], curve)
            proofs.append(
                Proof(
                    "g16",
                    curve,
                    {
                        "a": g1_to_json(A, curve),
                        "b": g2_to_json(B2, curve),
                        "c": g1_to_json(C, curve),
                    },
                    inputs,
                )
            )
        return proofs

    Z = jnp.asarray(np.stack(Z_list))  # (B, m, nl)

    dev = _r1cs_device(r1cs, n)
    H = _h_stage_batch(curve, n)(*_coo_args(dev), Z)[:, : n - 1]  # (B, n-1, nl)

    d = pk.dev()
    tier_m = _msm_tier(m)
    tier_h = _msm_tier(n - 1)
    for key, src, tier in (
        ("a_pad", pk.a_p128, tier_m),
        ("b1_pad", pk.b1_p128, tier_m),
        ("h_pad", pk.h_p128, tier_h),
        ("l_pad", pk.l_p128, tier_m),
        ("b2x_pad", pk.b2_x, tier_m),
        ("b2y_pad", pk.b2_y, tier_m),
    ):
        if key not in d:
            d[key] = jnp.asarray(_pad_rows(src, tier))

    def batch_scalars(S, mask, tier):
        # (B, k, nl) -> masked + padded to (B, tier, nl)
        k = S.shape[1]
        if mask is not None:
            S = jnp.where(jnp.asarray(mask)[None, :k, None], S, 0)
        if k < tier:
            S = jnp.pad(S, ((0, 0), (0, tier - k), (0, 0)))
        return S

    g1ops = curve_ops(g1_group(curve).q)
    nl = g1ops.f.nl
    c = _auto_c(tier_m)

    def g1_batch(P128, S):
        X, Y, Zc = _msm_batch(g1ops, c)(P128[:, :nl], P128[:, nl : 2 * nl], S)
        return g1ops.to_affine_ints((X, Y, Zc))

    a_aff = g1_batch(d["a_pad"], batch_scalars(Z, d["a_mask"], tier_m))
    b1_aff = g1_batch(d["b1_pad"], batch_scalars(Z, d["b1_mask"], tier_m))
    l_aff = g1_batch(d["l_pad"], batch_scalars(Z, d["l_mask"], tier_m))
    h_aff = g1_batch(d["h_pad"], batch_scalars(H, None, tier_h))

    g2ops = curve_ops_g2(curve)
    X2, Y2, Z2 = _msm_batch(g2ops, _auto_c(tier_m))(
        d["b2x_pad"], d["b2y_pad"], batch_scalars(Z, d["b2_mask"], tier_m)
    )
    b2_aff = g2ops.to_affine_ints((X2, Y2, Z2))

    g1grp = g1_group(curve)
    g2grp = g2_group(curve)

    def to_g1(aff):
        return g1grp.zero() if aff is None else PointG1(g1grp, aff[0], aff[1])

    def to_g2(aff):
        if aff is None:
            return g2grp.zero()
        from ..ec.tower import Fq2

        return PointG2(
            g2grp,
            Fq2(g2grp.tower, aff[0][0], aff[0][1]),
            Fq2(g2grp.tower, aff[1][0], aff[1][1]),
        )

    proofs: List[Proof] = []
    for b in range(B):
        r, s = rand(), rand()
        a_acc, b1_acc = to_g1(a_aff[b]), to_g1(b1_aff[b])
        l_acc, h_acc = to_g1(l_aff[b]), to_g1(h_aff[b])
        b2_acc = to_g2(b2_aff[b])
        delta_g1 = pk.delta_g1
        A = pk.alpha_g1 + a_acc + _fb_mul_g1(delta_g1, r)
        B1 = pk.beta_g1 + b1_acc + _fb_mul_g1(delta_g1, s)
        B2 = pk.beta_g2 + b2_acc + _fb_mul_g2(pk.delta_g2, s)
        C = l_acc + h_acc + A * s + B1 * r - _fb_mul_g1(delta_g1, r * s % p)
        inputs = _public_inputs_json(r1cs, witnesses[b], curve)
        proofs.append(
            Proof(
                "g16",
                curve,
                {
                    "a": g1_to_json(A, curve),
                    "b": g2_to_json(B2, curve),
                    "c": g1_to_json(C, curve),
                },
                inputs,
            )
        )
    return proofs


def verify(vk: VerificationKey, proof: Proof) -> bool:
    curve = vk.curve
    p = P.SCALAR_FIELDS[curve].p
    try:
        A = g1_from_json(proof.points["a"], curve)
        B = g2_from_json(proof.points["b"], curve)
        C = g1_from_json(proof.points["c"], curve)
        gamma_abc = [g1_from_json(x, curve) for x in vk.data["gamma_abc"]]
        alpha = g1_from_json(vk.data["alpha"], curve)
        beta = g2_from_json(vk.data["beta"], curve)
        gamma = g2_from_json(vk.data["gamma"], curve)
        delta = g2_from_json(vk.data["delta"], curve)
    except (ValueError, KeyError):
        return False

    inputs = [fr_from_json(x, curve) for x in proof.inputs]
    if len(inputs) + 1 != len(gamma_abc):
        return False

    vk_x = gamma_abc[0]
    for pub, pt in zip(inputs, gamma_abc[1:]):
        vk_x = vk_x + pt * pub

    # e(A,B) = e(alpha,beta) e(vk_x,gamma) e(C,delta)
    return pairing_product_is_one(
        curve,
        [(-A, B), (alpha, beta), (vk_x, gamma), (C, delta)],
    )
