"""GM17 (Groth-Maller 2017): simulation-extractable SNARK over a SAP.

Reference backend: zokrates_ark/src/gm17.rs (arkworks ark-gm17). VK/proof
JSON shapes follow zokrates_proof_systems/src/scheme/gm17.rs:29-37
({h, g_alpha, h_beta, g_gamma, h_gamma, query}, {a, b, c}), and the
verification equations are exactly the ones in the exported Solidity
verifier (scheme/gm17.rs:180-184):

  (1) e(g_alpha, h_beta) * e(vk_x, h_gamma) * e(C, H)
        == e(A + g_alpha, B + h_beta)
  (2) e(A, h_gamma) == e(g_gamma, B)

Construction: R1CS -> SAP (square arithmetic program): each constraint
(a.z)(b.z) = (c.z) becomes the squaring pair

  ((a+b).z)^2 = 4(c.z) + d      ((a-b).z)^2 = d

with d a fresh witness; instance binding adds the same pair for
(z_j)(z_0) = z_j per instance variable. With U = sum z_i u_i(x),
W = sum z_i w_i(x), t(X) = X^n - 1 and U^2 - W = h t:

  A = G^{gamma(U + r t)}        B = H^{gamma(U + r t)}
  C = G^{ sum_wit z_i (gamma^2 w_i + gamma(alpha+beta) u_i)
          + gamma^2 (h + 2 r Ucoef) . t x^j
          + r^2 gamma^2 t^2 + r gamma(alpha+beta) t }
  query_i = G^{gamma w_i + (alpha+beta) u_i}   (instance)

which satisfies (1)-(2) identically; h and the A/B/C MSMs run on the same
device NTT/MSM kernels as Groth16.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from ..ec.curve import PointG1, PointG2, g1_group, g2_group
from ..ec.pairing import pairing_product_is_one
from ..fields import params as P
from ..ir.r1cs import R1CS
from ..ir.witness import Witness
from .groth16 import _lagrange_at_tau, _msm_g1, _msm_g2, _next_pow2
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


@dataclass
class SAP:
    """Square arithmetic program rows over the dense variable space
    [r1cs vars] + [one d per row-pair]."""

    num_vars: int
    num_instance: int
    U: List[List[Tuple[int, int]]]
    W: List[List[Tuple[int, int]]]
    pair_sources: List[Tuple[List[Tuple[int, int]], List[Tuple[int, int]]]]
    # (a_minus_b row per pair) to compute the d witnesses at prove time


def r1cs_to_sap(r1cs: R1CS, p: int) -> SAP:
    ni = r1cs.num_instance
    rows_U, rows_W, pairs = [], [], []
    d_base = r1cs.num_variables

    def neg(row):
        return [(i, (-c) % p) for i, c in row]

    def addrows(x, y):
        acc: Dict[int, int] = {}
        for i, c in x + y:
            acc[i] = (acc.get(i, 0) + c) % p
        return [(i, c) for i, c in acc.items() if c]

    def scale(row, k):
        return [(i, c * k % p) for i, c in row]

    k = 0
    # instance binding pairs: (z_j)*(z_0) = z_j
    for j in range(ni):
        a, b, c = [(j, 1)], [(0, 1)], [(j, 1)]
        d = d_base + k
        rows_U.append(addrows(a, b))
        rows_W.append(addrows(scale(c, 4), [(d, 1)]))
        rows_U.append(addrows(a, neg(b)))
        rows_W.append([(d, 1)])
        pairs.append((addrows(a, neg(b)), c))
        k += 1
    for a, b, c in zip(r1cs.A, r1cs.B, r1cs.C):
        d = d_base + k
        rows_U.append(addrows(a, b))
        rows_W.append(addrows(scale(c, 4), [(d, 1)]))
        rows_U.append(addrows(a, neg(b)))
        rows_W.append([(d, 1)])
        pairs.append((addrows(a, neg(b)), c))
        k += 1

    return SAP(
        num_vars=d_base + k,
        num_instance=ni,
        U=rows_U,
        W=rows_W,
        pair_sources=pairs,
    )


@dataclass
class ProvingKey:
    curve: str
    domain_size: int
    num_instance: int
    num_r1cs_vars: int
    a_query: List[Optional[Tuple[int, int]]]
    b_query: List[Optional[object]]       # G2 points
    c_query: List[Optional[Tuple[int, int]]]   # witness-indexed
    h_query: List[Tuple[int, int]]        # G^{gamma^2 t x^j}, j = 0..n-1
    g_gamma_t: PointG1
    h_gamma_t: object
    g_gamma2_t2: PointG1
    g_ab_t: PointG1
    sap_pairs: List[Tuple[List[Tuple[int, int]], List[Tuple[int, int]]]]
    sap_U: List[List[Tuple[int, int]]]
    sap_W: List[List[Tuple[int, int]]]


def setup(r1cs: R1CS, rng=None) -> Tuple[ProvingKey, VerificationKey]:
    curve = r1cs.curve
    p = P.SCALAR_FIELDS[curve].p
    rand = rng or (lambda: secrets.randbelow(p - 1) + 1)
    g1 = g1_group(curve).generator()
    g2 = g2_group(curve).generator()

    sap = r1cs_to_sap(r1cs, p)
    m = len(sap.U)
    n = _next_pow2(m)
    dom = domain_for_curve(curve, n)

    alpha, beta, gamma, x = (rand() for _ in range(4))
    ab = (alpha + beta) % p
    lag = _lagrange_at_tau(p, n, dom.omega, x)
    t_x = (pow(x, n, p) - 1) % p

    u_t = [0] * sap.num_vars
    w_t = [0] * sap.num_vars
    for r, row in enumerate(sap.U):
        for i, coef in row:
            u_t[i] = (u_t[i] + coef * lag[r]) % p
    for r, row in enumerate(sap.W):
        for i, coef in row:
            w_t[i] = (w_t[i] + coef * lag[r]) % p

    def g1m(s):
        return (g1 * s) if s % p else None

    def g2m(s):
        return (g2 * s) if s % p else None

    a_query = [g1m(gamma * u_t[i]) for i in range(sap.num_vars)]
    b_query = [g2m(gamma * u_t[i]) for i in range(sap.num_vars)]
    c_query = [
        g1m((gamma * gamma % p) * w_t[i] + gamma * ab % p * u_t[i])
        for i in range(sap.num_instance, sap.num_vars)
    ]
    h_query = []
    base = gamma * gamma % p * t_x % p
    acc = base
    for _ in range(n):
        h_query.append(g1 * acc)
        acc = acc * x % p

    query = [
        g1 * ((gamma * w_t[i] + ab * u_t[i]) % p) for i in range(sap.num_instance)
    ]

    pk = ProvingKey(
        curve=curve,
        domain_size=n,
        num_instance=sap.num_instance,
        num_r1cs_vars=r1cs.num_variables,
        a_query=[(pt.x, pt.y) if pt else None for pt in a_query],
        b_query=b_query,
        c_query=[(pt.x, pt.y) if pt else None for pt in c_query],
        h_query=[(pt.x, pt.y) for pt in h_query],
        g_gamma_t=g1 * (gamma * t_x % p),
        h_gamma_t=g2 * (gamma * t_x % p),
        g_gamma2_t2=g1 * (gamma * gamma % p * t_x % p * t_x % p),
        g_ab_t=g1 * (gamma * ab % p * t_x % p),
        sap_pairs=sap.pair_sources,
        sap_U=sap.U,
        sap_W=sap.W,
    )
    vk = VerificationKey(
        "gm17",
        curve,
        {
            "h": g2_to_json(g2, curve),
            "g_alpha": g1_to_json(g1 * alpha, curve),
            "h_beta": g2_to_json(g2 * beta, curve),
            "g_gamma": g1_to_json(g1 * gamma, curve),
            "h_gamma": g2_to_json(g2 * gamma, curve),
            "query": [g1_to_json(pt, curve) for pt in query],
        },
    )
    return pk, vk


def prove(r1cs: R1CS, pk: ProvingKey, witness: Witness, rng=None) -> Proof:
    curve = r1cs.curve
    p = P.SCALAR_FIELDS[curve].p
    rand = rng or (lambda: secrets.randbelow(p))
    n = pk.domain_size
    dom = domain_for_curve(curve, n)
    f = dom.ops

    z = [v % p for v in r1cs.full_assignment(witness)]
    # extend with the SAP square witnesses
    for am_b, _c in pk.sap_pairs:
        v = sum(c * z[i] for i, c in am_b) % p
        z.append(v * v % p)

    # U/W evaluations over the domain
    u_e = [0] * n
    w_e = [0] * n
    for r, row in enumerate(pk.sap_U):
        u_e[r] = sum(c * z[i] for i, c in row) % p
    for r, row in enumerate(pk.sap_W):
        w_e[r] = sum(c * z[i] for i, c in row) % p

    U = f.encode(u_e)
    W = f.encode(w_e)
    g = P.SCALAR_FIELDS[curve].smallest_nonresidue
    z_coset_inv = pow((pow(g, n, p) - 1) % p, -1, p)
    zinv_mont = f.encode_scalar(z_coset_inv)
    dom.warm_coset(g)

    import jax

    key = ("gm17_h", curve, n)
    if key not in _H_JIT:

        def pipeline(U, W):
            u_c = dom.ifft(U)
            w_c = dom.ifft(W)
            u_cs = dom.coset_fft(u_c, g)
            w_cs = dom.coset_fft(w_c, g)
            h_cs = f.mul_(f.sub_(f.mul_(u_cs, u_cs), w_cs), zinv_mont)
            return dom.coset_ifft(h_cs, g), u_c

        _H_JIT[key] = jax.jit(pipeline)
    h_dev, ucoef_dev = _H_JIT[key](U, W)
    h = f.decode(h_dev)[: n - 1]
    ucoef = f.decode(ucoef_dev)

    r = rand()

    A = _msm_g1(curve, pk.a_query, z)
    A = A + pk.g_gamma_t * r
    B = _msm_g2(curve, pk.b_query, z)
    B = B + pk.h_gamma_t * r

    ni = pk.num_instance
    c_acc = _msm_g1(curve, pk.c_query, z[ni:])
    h_exp = [(h[j] if j < len(h) else 0) + 2 * r * ucoef[j] for j in range(n)]
    h_acc = _msm_g1(curve, pk.h_query, h_exp)
    C = c_acc + h_acc + pk.g_gamma2_t2 * (r * r % p) + pk.g_ab_t * r

    inputs = [fr_to_json(z[i], curve) for i in range(1, ni)]
    return Proof(
        "gm17",
        curve,
        {
            "a": g1_to_json(A, curve),
            "b": g2_to_json(B, curve),
            "c": g1_to_json(C, curve),
        },
        inputs,
    )


_H_JIT: Dict = {}


def verify(vk: VerificationKey, proof: Proof) -> bool:
    curve = vk.curve
    try:
        A = g1_from_json(proof.points["a"], curve)
        B = g2_from_json(proof.points["b"], curve)
        C = g1_from_json(proof.points["c"], curve)
        H = g2_from_json(vk.data["h"], curve)
        g_alpha = g1_from_json(vk.data["g_alpha"], curve)
        h_beta = g2_from_json(vk.data["h_beta"], curve)
        g_gamma = g1_from_json(vk.data["g_gamma"], curve)
        h_gamma = g2_from_json(vk.data["h_gamma"], curve)
        query = [g1_from_json(q, curve) for q in vk.data["query"]]
    except (ValueError, KeyError):
        return False

    inputs = [fr_from_json(s, curve) for s in proof.inputs]
    if len(inputs) + 1 != len(query):
        return False
    vk_x = query[0]
    for v, q in zip(inputs, query[1:]):
        vk_x = vk_x + q * v

    # (1) e(g_alpha, h_beta) e(vk_x, h_gamma) e(C, H) == e(A + g_alpha, B + h_beta)
    if not pairing_product_is_one(
        curve,
        [
            (g_alpha, h_beta),
            (vk_x, h_gamma),
            (C, H),
            (-(A + g_alpha), B + h_beta),
        ],
    ):
        return False
    # (2) e(A, h_gamma) == e(g_gamma, B)
    return pairing_product_is_one(curve, [(A, h_gamma), (-g_gamma, B)])
