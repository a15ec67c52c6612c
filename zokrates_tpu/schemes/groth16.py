"""Groth16 setup / prove / verify, TPU-first.

The reference delegates all of this to arkworks (zokrates_ark/src/groth16.rs)
or bellman (zokrates_bellman); here the algorithm is assembled from our own
kernels:

  * QAP reduction on the 2-adic domain sized next_pow2(constraints +
    instance_count), with the instance-binding rows ark-groth16 appends
    (A[nc+j] = z_j) so public inputs are bound in the A polynomial,
  * h(X) = (A·B - C)/Z computed as device NTT round-trips on a coset of the
    vanishing domain (Z is constant on the coset),
  * proof point MSMs (A/B1/B2/C/H queries) on device via kernels/msm.py —
    G2 runs the same Pippenger over Fq2 limbs,
  * verification via the host pairing-product oracle (4 Miller loops).

Proof/VK JSON is byte-compatible with zokrates_proof_systems/scheme/
groth16.rs {a,b,c} / {alpha,beta,gamma,delta,gamma_abc}.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ec.curve import PointG1, PointG2, g1_group, g2_group
from ..ec.pairing import pairing_product_is_one
from ..fields import params as P
from ..fields.limbs import ints_to_limbs, n_limbs
from ..ir.r1cs import R1CS
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


@dataclass
class ProvingKey:
    curve: str
    domain_size: int
    num_instance: int
    alpha_g1: PointG1
    beta_g1: PointG1
    beta_g2: object
    delta_g1: PointG1
    delta_g2: object
    a_query: List[Optional[Tuple[int, int]]]       # affine or None (zero poly)
    b_g1_query: List[Optional[Tuple[int, int]]]
    b_g2_query: List[Optional[object]]
    h_query: List[Tuple[int, int]]
    l_query: List[Optional[Tuple[int, int]]]


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

    def g1_mul(s):
        return (g1 * s) if s else None

    def g2_mul(s):
        return (g2 * s) if s else None

    a_query = [g1_mul(a_t[i]) for i in range(m)]
    b_g1_query = [g1_mul(b_t[i]) for i in range(m)]
    b_g2_query = [g2_mul(b_t[i]) for i in range(m)]

    # h query: tau^j * Z(tau) / delta for j in 0..n-2
    h_query = []
    tp = z_tau * delta_inv % p
    for _ in range(n - 1):
        h_query.append(g1 * tp)
        tp = tp * tau % p

    l_query = [
        g1_mul((beta * a_t[i] + alpha * b_t[i] + c_t[i]) % p * delta_inv % p)
        for i in range(ni, m)
    ]
    gamma_abc = [
        g1 * ((beta * a_t[i] + alpha * b_t[i] + c_t[i]) % p * gamma_inv % p)
        for i in range(ni)
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
        a_query=[(pt.x, pt.y) if pt else None for pt in a_query],
        b_g1_query=[(pt.x, pt.y) if pt else None for pt in b_g1_query],
        b_g2_query=b_g2_query,
        h_query=[(pt.x, pt.y) for pt in h_query],
        l_query=[(pt.x, pt.y) if pt else None for pt in l_query],
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
# Proving
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
    """Device G1 MSM; drops None points (zero polynomials)."""
    grp = g1_group(curve)
    pairs = [(pt, s % grp.r) for pt, s in zip(points, scalars) if pt is not None and s % grp.r != 0]
    if not pairs:
        return grp.zero()
    pairs = _pad_pairs(pairs)
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
    ops = curve_ops_g2(curve)
    Px = ops.f.encode([(pt.x.c0, pt.x.c1) for pt, _ in pairs])
    Py = ops.f.encode([(pt.y.c0, pt.y.c1) for pt, _ in pairs])
    nls = n_limbs(grp.r)
    S = jnp.asarray(ints_to_limbs([s for _, s in pairs], nls))
    res = msm_jit(ops, c)(Px, Py, S)
    aff = ops.to_affine_ints((res[0][None], res[1][None], res[2][None]))[0]
    if aff is None:
        return grp.zero()
    from ..ec.tower import Fq2

    x = Fq2(grp.tower, aff[0][0], aff[0][1])
    y = Fq2(grp.tower, aff[1][0], aff[1][1])
    return PointG2(grp, x, y)


def compute_h(r1cs: R1CS, z: Sequence[int], n: int) -> List[int]:
    """Coefficients of h(X) = (A(X)B(X) - C(X)) / Z(X), via coset NTTs."""
    curve = r1cs.curve
    p = P.SCALAR_FIELDS[curve].p
    dom = domain_for_curve(curve, n)
    nc, ni = r1cs.num_constraints, r1cs.num_instance

    a_e = _matrix_evals(r1cs.A, z, n, p)
    b_e = _matrix_evals(r1cs.B, z, n, p)
    c_e = _matrix_evals(r1cs.C, z, n, p)
    for j in range(ni):
        a_e[nc + j] = z[j] % p

    f = dom.ops
    A = f.encode(a_e)
    B = f.encode(b_e)
    C = f.encode(c_e)

    g = P.SCALAR_FIELDS[curve].smallest_nonresidue
    z_on_coset_inv = pow((pow(g, n, p) - 1) % p, -1, p)
    zinv_mont = f.encode_scalar(z_on_coset_inv)
    dom.warm_coset(g)

    def pipeline(A, B, C):
        a_c = dom.ifft(A)
        b_c = dom.ifft(B)
        c_c = dom.ifft(C)
        a_cs = dom.coset_fft(a_c, g)
        b_cs = dom.coset_fft(b_c, g)
        c_cs = dom.coset_fft(c_c, g)
        h_cs = f.mul_(f.sub_(f.mul_(a_cs, b_cs), c_cs), zinv_mont)
        return dom.coset_ifft(h_cs, g)

    key = ("g16_h", curve, n)
    if key not in _H_JIT:
        _H_JIT[key] = jax.jit(pipeline)
    h = _H_JIT[key](A, B, C)
    coeffs = f.decode(h)
    # degree <= n-2: the last coefficient must vanish
    return coeffs[: n - 1]


_H_JIT: Dict = {}


def prove(r1cs: R1CS, pk: ProvingKey, witness: Witness, rng=None) -> Proof:
    curve = r1cs.curve
    p = P.SCALAR_FIELDS[curve].p
    rand = rng or (lambda: secrets.randbelow(p))
    g1 = g1_group(curve)
    g2grp = g2_group(curve)

    z = r1cs.full_assignment(witness)
    z = [v % p for v in z]
    n = pk.domain_size
    ni = pk.num_instance

    h = compute_h(r1cs, z, n)

    r, s = rand(), rand()

    a_acc = _msm_g1(curve, pk.a_query, z)
    b1_acc = _msm_g1(curve, pk.b_g1_query, z)
    b2_acc = _msm_g2(curve, pk.b_g2_query, z)

    A = pk.alpha_g1 + a_acc + pk.delta_g1 * r
    B1 = pk.beta_g1 + b1_acc + pk.delta_g1 * s
    B2 = pk.beta_g2 + b2_acc + pk.delta_g2 * s

    l_acc = _msm_g1(curve, pk.l_query, z[ni:])
    h_acc = _msm_g1(curve, pk.h_query, h)

    rs = r * s % p
    C = l_acc + h_acc + A * s + B1 * r - pk.delta_g1 * rs

    inputs = [fr_to_json(z[i], curve) for i in range(1, ni)]
    return Proof(
        "g16",
        curve,
        {
            "a": g1_to_json(A, curve),
            "b": g2_to_json(B2, curve),
            "c": g1_to_json(C, curve),
        },
        inputs,
    )


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
