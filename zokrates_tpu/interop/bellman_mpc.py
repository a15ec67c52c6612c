"""bellman/phase2 MPC ceremony artifacts: `mpc.params` + `phase1radix` files.

The reference's MPC backend (zokrates_bellman/src/groth16.rs:103-159) is a
thin wrapper over the `phase2` crate (a ZoKrates fork of the zcash phase2
library): `initialize` consumes a phase-1 "powers of tau" radix file and
emits circuit-specific Groth16 parameters with delta = 1, `contribute`
multiplies delta by a secret and publishes a proof-of-knowledge public key,
and `verify` replays the chain. This module implements that artifact
surface natively:

  * the `phase1radix2mN` table file (alpha/beta + Lagrange-basis tau powers
    in both groups + the [tau^i Z(tau)] h terms) — reader, writer, and a
    TEST-ONLY generator (`generate_radix`) standing in for the real Powers
    of Tau ceremony output,
  * the `mpc.params` container: bellman `Parameters` (vk + h/l/a/b_g1/b_g2
    query vectors, uncompressed big-endian points with bellman's
    infinity-flag convention) + a 64-byte cs hash + the contribution list
    (delta_after, s, s_delta, r_delta, transcript),
  * initialize / contribute / verify / export over that container with the
    phase2 trust model: gamma is fixed to one, only delta is randomized,
    and each contribution proves knowledge of its delta factor d via
    same-ratio checks  e(s, r_delta) == e(s_delta, r)  and
    e(delta_prev, r_delta) == e(delta_after, r)  with r = hash_to_g2 over
    the running transcript.

Byte layout follows the public phase2/bellman serialization structure
(Parameters::write / MPCParameters::write / PublicKey::write). The
environment has no Rust toolchain, so cross-implementation byte equality
cannot be oracle-tested here; the container round-trips through this
reader/writer and the layout is kept field-for-field so a reference build
can read it. The one deliberately-divergent primitive is hash_to_g2
(phase2 seeds a rand-0.4 ChaChaRng and samples the curve's `random`; we
use a documented try-and-increment over blake2b counters).
"""

from __future__ import annotations

import hashlib
import io
import secrets
import struct
from dataclasses import dataclass, field as dfield
from typing import List, Optional, Tuple

from ..ec.curve import Fq2, PointG1, PointG2, g1_group, g2_group
from ..ec.pairing import pairing_product_is_one
from ..fields import params as P
from ..ir.r1cs import R1CS

# MPC is a bellman-backend feature in the reference: bn128 + bls12_381 only
# (zokrates_cli/src/bin.rs backend gating).
_FQ_BYTES = {"bn128": 32, "bls12_381": 48}


def _fqb(curve: str) -> int:
    try:
        return _FQ_BYTES[curve]
    except KeyError:
        raise ValueError(
            f"phase2 MPC artifacts support bn128/bls12_381, not {curve}"
        ) from None


# ---------------------------------------------------------------------------
# Point codecs — bellman "uncompressed" encoding: x || y big-endian, with
# the infinity flag (0x40) in the top bits of the first byte (the three
# MSBs are free: both moduli are < 2^254 / 2^381).
# ---------------------------------------------------------------------------


def g1_to_bytes(curve: str, pt: Optional[PointG1]) -> bytes:
    nb = _fqb(curve)
    if pt is None or pt.infinity:
        out = bytearray(2 * nb)
        out[0] = 0x40
        return bytes(out)
    return pt.x.to_bytes(nb, "big") + pt.y.to_bytes(nb, "big")


def g1_from_bytes(curve: str, data: bytes, check: bool = True) -> Optional[PointG1]:
    nb = _fqb(curve)
    if len(data) != 2 * nb:
        raise ValueError("bad G1 length")
    if data[0] & 0x40:
        if any(b for b in bytes([data[0] & 0x3F]) + data[1:]):
            raise ValueError("G1 infinity with nonzero body")
        return None
    x = int.from_bytes(data[:nb], "big")
    y = int.from_bytes(data[nb:], "big")
    pt = PointG1(g1_group(curve), x, y)
    if check and not pt.is_on_curve():
        raise ValueError("G1 point not on curve")
    return pt


def g2_to_bytes(curve: str, pt: Optional[PointG2]) -> bytes:
    """Fq2 coordinate order: c1 || c0 (the pairing crate's convention)."""
    nb = _fqb(curve)
    if pt is None or pt.infinity:
        out = bytearray(4 * nb)
        out[0] = 0x40
        return bytes(out)
    return (
        pt.x.c1.to_bytes(nb, "big")
        + pt.x.c0.to_bytes(nb, "big")
        + pt.y.c1.to_bytes(nb, "big")
        + pt.y.c0.to_bytes(nb, "big")
    )


def g2_from_bytes(curve: str, data: bytes, check: bool = True) -> Optional[PointG2]:
    nb = _fqb(curve)
    if len(data) != 4 * nb:
        raise ValueError("bad G2 length")
    if data[0] & 0x40:
        if any(b for b in bytes([data[0] & 0x3F]) + data[1:]):
            raise ValueError("G2 infinity with nonzero body")
        return None
    grp = g2_group(curve)
    c = [int.from_bytes(data[i * nb : (i + 1) * nb], "big") for i in range(4)]
    pt = PointG2(grp, Fq2(grp.tower, c[1], c[0]), Fq2(grp.tower, c[3], c[2]))
    if check and not pt.is_on_curve():
        raise ValueError("G2 point not on curve")
    return pt


def _read_exact(f, n: int) -> bytes:
    data = f.read(n)
    if len(data) != n:
        raise ValueError("unexpected EOF")
    return data


def _read_g1(curve: str, f) -> Optional[PointG1]:
    return g1_from_bytes(curve, _read_exact(f, 2 * _fqb(curve)))


def _read_g2(curve: str, f) -> Optional[PointG2]:
    return g2_from_bytes(curve, _read_exact(f, 4 * _fqb(curve)))


# ---------------------------------------------------------------------------
# phase1radix: the Powers-of-Tau output specialized to one domain size.
# Layout (phase2 MPCParameters::new read order): alpha_g1, beta_g1, beta_g2,
# then n Lagrange coeffs in G1, n in G2, n alpha-coeffs (G1), n beta-coeffs
# (G1), then n-1 h terms [tau^i * Z(tau)] G1.
# ---------------------------------------------------------------------------


@dataclass
class Phase1Radix:
    curve: str
    alpha_g1: PointG1
    beta_g1: PointG1
    beta_g2: PointG2
    coeffs_g1: List[Optional[PointG1]]  # [L_i(tau)] G1
    coeffs_g2: List[Optional[PointG2]]  # [L_i(tau)] G2
    alpha_coeffs_g1: List[Optional[PointG1]]  # [alpha L_i(tau)] G1
    beta_coeffs_g1: List[Optional[PointG1]]  # [beta L_i(tau)] G1
    h: List[Optional[PointG1]]  # [tau^i Z(tau)] G1, i < n-1

    @property
    def n(self) -> int:
        return len(self.coeffs_g1)

    def write(self, f) -> None:
        c = self.curve
        f.write(g1_to_bytes(c, self.alpha_g1))
        f.write(g1_to_bytes(c, self.beta_g1))
        f.write(g2_to_bytes(c, self.beta_g2))
        for pt in self.coeffs_g1:
            f.write(g1_to_bytes(c, pt))
        for pt in self.coeffs_g2:
            f.write(g2_to_bytes(c, pt))
        for pt in self.alpha_coeffs_g1:
            f.write(g1_to_bytes(c, pt))
        for pt in self.beta_coeffs_g1:
            f.write(g1_to_bytes(c, pt))
        for pt in self.h:
            f.write(g1_to_bytes(c, pt))

    @classmethod
    def read(cls, curve: str, f, n: int) -> "Phase1Radix":
        """n is the domain size (the reference infers it from the circuit
        and picks the matching phase1radix2m{k} file)."""
        alpha = _read_g1(curve, f)
        beta1 = _read_g1(curve, f)
        beta2 = _read_g2(curve, f)
        out = cls(curve, alpha, beta1, beta2, [], [], [], [], [])
        out.coeffs_g1 = [_read_g1(curve, f) for _ in range(n)]
        out.coeffs_g2 = [_read_g2(curve, f) for _ in range(n)]
        out.alpha_coeffs_g1 = [_read_g1(curve, f) for _ in range(n)]
        out.beta_coeffs_g1 = [_read_g1(curve, f) for _ in range(n)]
        out.h = [_read_g1(curve, f) for _ in range(n - 1)]
        return out


def generate_radix(curve: str, n: int, rng=None) -> Phase1Radix:
    """TEST-ONLY phase-1 substitute: samples fresh (tau, alpha, beta) and
    evaluates the radix tables with device fixed-base multiplications. The
    real file comes from the public Powers of Tau ceremony — this generator
    exists so the phase-2 pipeline is testable end-to-end in-process."""
    from ..kernels.ntt import domain_for_curve
    from ..schemes.groth16 import (
        _fb_g1_points,
        _lagrange_at_tau,
    )

    assert n & (n - 1) == 0, "domain size must be a power of two"
    p = P.SCALAR_FIELDS[curve].p
    rand = rng or (lambda: secrets.randbelow(p - 1) + 1)
    tau, alpha, beta = rand(), rand(), rand()
    dom = domain_for_curve(curve, n)
    lag = _lagrange_at_tau(p, n, dom.omega, tau)
    z_tau = (pow(tau, n, p) - 1) % p

    g1 = g1_group(curve).generator()
    g2 = g2_group(curve).generator()

    coeffs_g1 = _fb_g1_points(curve, lag)
    alpha_coeffs_g1 = _fb_g1_points(curve, [alpha * v % p for v in lag])
    beta_coeffs_g1 = _fb_g1_points(curve, [beta * v % p for v in lag])
    h_s = []
    tp = z_tau
    for _ in range(n - 1):
        h_s.append(tp)
        tp = tp * tau % p
    h = _fb_g1_points(curve, h_s)
    coeffs_g2 = [g2 * v for v in lag]

    return Phase1Radix(
        curve=curve,
        alpha_g1=g1 * alpha,
        beta_g1=g1 * beta,
        beta_g2=g2 * beta,
        coeffs_g1=coeffs_g1,
        coeffs_g2=coeffs_g2,
        alpha_coeffs_g1=alpha_coeffs_g1,
        beta_coeffs_g1=beta_coeffs_g1,
        h=h,
    )


# ---------------------------------------------------------------------------
# bellman groth16::Parameters — the pk/vk payload inside mpc.params.
# Write order (Parameters::write): vk { alpha_g1, beta_g1, beta_g2,
# gamma_g2, delta_g1, delta_g2, u32-BE ic_len, ic... }, then each query
# vector as u32-BE length + uncompressed points: h, l, a, b_g1, b_g2.
# ---------------------------------------------------------------------------


@dataclass
class BellmanParameters:
    curve: str
    alpha_g1: PointG1
    beta_g1: PointG1
    beta_g2: PointG2
    gamma_g2: PointG2
    delta_g1: PointG1
    delta_g2: PointG2
    ic: List[PointG1]
    h: List[PointG1]
    l: List[PointG1]
    a: List[Optional[PointG1]]
    b_g1: List[Optional[PointG1]]
    b_g2: List[Optional[PointG2]]

    def write(self, f) -> None:
        c = self.curve
        f.write(g1_to_bytes(c, self.alpha_g1))
        f.write(g1_to_bytes(c, self.beta_g1))
        f.write(g2_to_bytes(c, self.beta_g2))
        f.write(g2_to_bytes(c, self.gamma_g2))
        f.write(g1_to_bytes(c, self.delta_g1))
        f.write(g2_to_bytes(c, self.delta_g2))
        f.write(struct.pack(">I", len(self.ic)))
        for pt in self.ic:
            f.write(g1_to_bytes(c, pt))
        for vec, enc in (
            (self.h, g1_to_bytes),
            (self.l, g1_to_bytes),
            (self.a, g1_to_bytes),
            (self.b_g1, g1_to_bytes),
            (self.b_g2, g2_to_bytes),
        ):
            f.write(struct.pack(">I", len(vec)))
            for pt in vec:
                f.write(enc(c, pt))

    @classmethod
    def read(cls, curve: str, f) -> "BellmanParameters":
        alpha_g1 = _read_g1(curve, f)
        beta_g1 = _read_g1(curve, f)
        beta_g2 = _read_g2(curve, f)
        gamma_g2 = _read_g2(curve, f)
        delta_g1 = _read_g1(curve, f)
        delta_g2 = _read_g2(curve, f)

        def vec(reader):
            (ln,) = struct.unpack(">I", _read_exact(f, 4))
            return [reader(curve, f) for _ in range(ln)]

        ic = vec(_read_g1)
        h = vec(_read_g1)
        l = vec(_read_g1)
        a = vec(_read_g1)
        b_g1 = vec(_read_g1)
        b_g2 = vec(_read_g2)
        return cls(
            curve, alpha_g1, beta_g1, beta_g2, gamma_g2, delta_g1, delta_g2,
            ic, h, l, a, b_g1, b_g2,
        )


# ---------------------------------------------------------------------------
# PublicKey + MPCParameters containers
# ---------------------------------------------------------------------------


@dataclass
class PublicKey:
    delta_after: PointG1
    s: PointG1
    s_delta: PointG1
    r_delta: PointG2
    transcript: bytes  # 64 bytes

    def write(self, curve: str, f) -> None:
        f.write(g1_to_bytes(curve, self.delta_after))
        f.write(g1_to_bytes(curve, self.s))
        f.write(g1_to_bytes(curve, self.s_delta))
        f.write(g2_to_bytes(curve, self.r_delta))
        assert len(self.transcript) == 64
        f.write(self.transcript)

    @classmethod
    def read(cls, curve: str, f) -> "PublicKey":
        return cls(
            delta_after=_read_g1(curve, f),
            s=_read_g1(curve, f),
            s_delta=_read_g1(curve, f),
            r_delta=_read_g2(curve, f),
            transcript=_read_exact(f, 64),
        )

    def to_bytes(self, curve: str) -> bytes:
        buf = io.BytesIO()
        self.write(curve, buf)
        return buf.getvalue()


@dataclass
class MPCParameters:
    curve: str
    params: BellmanParameters
    cs_hash: bytes  # 64 bytes
    contributions: List[PublicKey] = dfield(default_factory=list)

    def write(self, f) -> None:
        self.params.write(f)
        assert len(self.cs_hash) == 64
        f.write(self.cs_hash)
        f.write(struct.pack(">I", len(self.contributions)))
        for pk in self.contributions:
            pk.write(self.curve, f)

    @classmethod
    def read(cls, curve: str, f) -> "MPCParameters":
        params = BellmanParameters.read(curve, f)
        cs_hash = _read_exact(f, 64)
        (ln,) = struct.unpack(">I", _read_exact(f, 4))
        contributions = [PublicKey.read(curve, f) for _ in range(ln)]
        return cls(curve, params, cs_hash, contributions)


# ---------------------------------------------------------------------------
# Ceremony operations
# ---------------------------------------------------------------------------


def _sqrt_fq(q: int, a: int) -> Optional[int]:
    """Tonelli-Shanks square root in Fq; None if a is a non-residue."""
    a %= q
    if a == 0:
        return 0
    if pow(a, (q - 1) // 2, q) != 1:
        return None
    if q % 4 == 3:
        return pow(a, (q + 1) // 4, q)
    # full Tonelli-Shanks
    s, t = 0, q - 1
    while t % 2 == 0:
        s += 1
        t //= 2
    z = 2
    while pow(z, (q - 1) // 2, q) != q - 1:
        z += 1
    m, c, u, r = s, pow(z, t, q), pow(a, t, q), pow(a, (t + 1) // 2, q)
    while u != 1:
        i, tmp = 0, u
        while tmp != 1:
            tmp = tmp * tmp % q
            i += 1
        b = pow(c, 1 << (m - i - 1), q)
        m, c = i, b * b % q
        u, r = u * c % q, r * b % q
    return r


def _sqrt_fq2(x: Fq2) -> Optional[Fq2]:
    """Square root in Fq2 = Fq[u]/(u^2 - beta) by the norm method."""
    ctx = x.ctx
    q, beta = ctx.q, ctx.beta
    if x.is_zero():
        return Fq2(ctx, 0, 0)
    a0, a1 = x.c0, x.c1
    if a1 == 0:
        r = _sqrt_fq(q, a0)
        if r is not None:
            return Fq2(ctx, r, 0)
        r = _sqrt_fq(q, a0 * pow(beta, -1, q) % q)
        return None if r is None else Fq2(ctx, 0, r)
    norm = (a0 * a0 - beta * a1 * a1) % q
    alpha = _sqrt_fq(q, norm)
    if alpha is None:
        return None
    inv2 = pow(2, -1, q)
    for sgn in (alpha, q - alpha):
        x0sq = (a0 + sgn) * inv2 % q
        x0 = _sqrt_fq(q, x0sq)
        if x0 is None or x0 == 0:
            continue
        x1 = a1 * pow(2 * x0, -1, q) % q
        cand = Fq2(ctx, x0, x1)
        if cand * cand == x:
            return cand
    return None


def _mul_unreduced_g2(pt: PointG2, k: int) -> PointG2:
    """Double-and-add WITHOUT reducing k mod r: needed for cofactor
    clearing, where the input point's order is not r (PointG2.__mul__
    reduces mod the subgroup order, which is only valid in-subgroup)."""
    acc = PointG2(pt.curve, None, None)
    add = pt
    while k:
        if k & 1:
            acc = acc + add
        add = add + add
        k >>= 1
    return acc


# G2 cofactors h2 = |E'(Fq2)| / r (standard published curve constants;
# bn128's equals 2q - r by the BN trace identity)
_G2_COFACTOR = {
    "bn128": 21888242871839275222246405745257275088844257914179612981679871602714643921549,
    "bls12_381": 0x5D543A95414E7F1091D50792876A202CD91DE4547085ABAA68A205B2E5A7DDFA628F1CB4D9E82EF21537E293A6691AE1616EC6E786F0C70CF1C38E31C7238E5,
}


def _hash_to_g2(curve: str, digest: bytes) -> PointG2:
    """Deterministic digest -> G2 point (try-and-increment over blake2b
    counters, then cofactor-clear). DOCUMENTED DIVERGENCE from phase2,
    which seeds a rand-0.4 ChaChaRng with the digest and calls G2::random;
    the security property (r is an opaque point nobody knows the dlog of)
    is the same."""
    grp = g2_group(curve)
    q = grp.tower.q
    cof = _G2_COFACTOR[curve]
    ctr = 0
    while True:
        h1 = hashlib.blake2b(digest + b"c0" + ctr.to_bytes(4, "big")).digest()
        h2 = hashlib.blake2b(digest + b"c1" + ctr.to_bytes(4, "big")).digest()
        x = Fq2(grp.tower, int.from_bytes(h1, "big") % q, int.from_bytes(h2, "big") % q)
        rhs = x * x * x + grp.b2
        y = _sqrt_fq2(rhs)
        if y is not None:
            pt = _mul_unreduced_g2(PointG2(grp, x, y), cof)
            if not pt.infinity:
                return pt
        ctr += 1


def _params_hash(params: BellmanParameters) -> bytes:
    buf = io.BytesIO()
    params.write(buf)
    return hashlib.blake2b(buf.getvalue(), digest_size=64).digest()


def initialize(r1cs: R1CS, radix: Phase1Radix) -> MPCParameters:
    """phase2 MPCParameters::new: build circuit-specific Groth16 parameters
    from the phase-1 radix tables with gamma = delta = 1.

    Query math (in the exponent; L_i = Lagrange basis at tau):
      a[j]    = sum_r u_{r,j} [L_r]          (A-matrix column j)
      b_g1/b_g2 similarly over B
      ic/l[j] = [beta u_j + alpha v_j + w_j] via the alpha/beta coeff tables
      h[i]    = [tau^i Z(tau)] straight from the radix.
    Instance-binding rows (A[nc + j] += 1 at instance j) mirror
    schemes/groth16.setup so proofs bind public inputs identically."""
    curve = r1cs.curve
    if radix.curve != curve:
        raise ValueError("radix curve mismatch")
    p = P.SCALAR_FIELDS[curve].p
    nc, ni, m = r1cs.num_constraints, r1cs.num_instance, r1cs.num_variables
    n = 1 << max(1, (nc + ni - 1).bit_length())
    if radix.n != n:
        # Lagrange tables are domain-size specific (the reference ships one
        # phase1radix2m{k} file per k and picks the matching one)
        raise ValueError(f"radix is for domain 2^{radix.n.bit_length() - 1}, circuit needs {n}")

    # per-variable accumulation over sparse matrix columns, Jacobian host
    # math through the native C backend when available
    acc_a = _PointAccum(curve, m, "g1")
    acc_b1 = _PointAccum(curve, m, "g1")
    acc_b2 = _PointAccum(curve, m, "g2")
    acc_ext = _PointAccum(curve, m, "g1")  # beta*u + alpha*v + w

    for r, row in enumerate(r1cs.A):
        for j, coef in row:
            acc_a.add(j, radix.coeffs_g1[r], coef)
            acc_ext.add(j, radix.beta_coeffs_g1[r], coef)
    for j in range(ni):  # instance-binding rows
        acc_a.add(j, radix.coeffs_g1[nc + j], 1)
        acc_ext.add(j, radix.beta_coeffs_g1[nc + j], 1)
    for r, row in enumerate(r1cs.B):
        for j, coef in row:
            acc_b1.add(j, radix.coeffs_g1[r], coef)
            acc_b2.add(j, radix.coeffs_g2[r], coef)
            acc_ext.add(j, radix.alpha_coeffs_g1[r], coef)
    for r, row in enumerate(r1cs.C):
        for j, coef in row:
            acc_ext.add(j, radix.coeffs_g1[r], coef)

    a_q = acc_a.points()
    b1_q = acc_b1.points()
    b2_q = acc_b2.points()
    ext = acc_ext.points()

    g1 = g1_group(curve).generator()
    g2 = g2_group(curve).generator()
    zero1 = PointG1(g1_group(curve), None, None)

    ic = [pt if pt is not None else zero1 for pt in ext[:ni]]
    l_q = [pt if pt is not None else zero1 for pt in ext[ni:]]
    h_q = [pt for pt in radix.h[: n - 1]]

    params = BellmanParameters(
        curve=curve,
        alpha_g1=radix.alpha_g1,
        beta_g1=radix.beta_g1,
        beta_g2=radix.beta_g2,
        gamma_g2=g2,  # gamma = 1
        delta_g1=g1,  # delta = 1
        delta_g2=g2,
        ic=ic,
        h=h_q,
        l=l_q,
        a=a_q,
        b_g1=b1_q,
        b_g2=b2_q,
    )
    return MPCParameters(
        curve=curve,
        params=params,
        cs_hash=_params_hash(params),
        contributions=[],
    )


class _PointAccum:
    """Sparse per-index point accumulator: sum of coef * P contributions.

    Defers to one batched pass at the end: group terms by index, then for
    each index run a tiny Pippenger over its terms via host Jacobian ops
    (native C backend when built, Python fallback otherwise)."""

    def __init__(self, curve: str, m: int, group: str):
        self.curve = curve
        self.group = group
        self.terms: List[List[Tuple[object, int]]] = [[] for _ in range(m)]
        self.p = P.SCALAR_FIELDS[curve].p

    def add(self, idx: int, pt, coef: int) -> None:
        if pt is None:
            return
        coef %= self.p
        if coef:
            self.terms[idx].append((pt, coef))

    def points(self) -> List[Optional[object]]:
        out: List[Optional[object]] = []
        for terms in self.terms:
            if not terms:
                out.append(None)
                continue
            acc = None
            for pt, coef in terms:
                term = pt * coef if coef != 1 else pt
                acc = term if acc is None else acc + term
            out.append(None if acc is None or acc.infinity else acc)
        return out


def contribute(mpc: MPCParameters, entropy: Optional[str] = None) -> bytes:
    """Apply one participant's secret d: delta *= d, h/l /= d; publish the
    phase2-style proof of knowledge. Returns the 64-byte contribution hash
    (blake2b of the serialized public key)."""
    curve = mpc.curve
    r_ord = P.SCALAR_FIELDS[curve].p
    params = mpc.params
    g1 = g1_group(curve).generator()

    seed = (entropy or "").encode() + secrets.token_bytes(32)
    d = int.from_bytes(hashlib.sha512(seed + b"d").digest(), "big") % (r_ord - 1) + 1
    rho = int.from_bytes(hashlib.sha512(seed + b"s").digest(), "big") % (r_ord - 1) + 1
    d_inv = pow(d, -1, r_ord)

    s = g1 * rho
    s_delta = s * d

    # transcript = H(cs_hash || prior pubkeys || s || s_delta)
    h = hashlib.blake2b(digest_size=64)
    h.update(mpc.cs_hash)
    for pk in mpc.contributions:
        h.update(pk.to_bytes(curve))
    h.update(g1_to_bytes(curve, s))
    h.update(g1_to_bytes(curve, s_delta))
    transcript = h.digest()

    r_pt = _hash_to_g2(curve, transcript)
    r_delta = r_pt * d

    pubkey = PublicKey(
        delta_after=params.delta_g1 * d,
        s=s,
        s_delta=s_delta,
        r_delta=r_delta,
        transcript=transcript,
    )

    params.delta_g1 = params.delta_g1 * d
    params.delta_g2 = params.delta_g2 * d
    params.h = [_scale1(pt, d_inv) for pt in params.h]
    params.l = [_scale1(pt, d_inv) for pt in params.l]
    mpc.contributions.append(pubkey)
    return hashlib.blake2b(pubkey.to_bytes(curve), digest_size=64).digest()


def beacon(mpc: MPCParameters, beacon_hash: str, iterations: int = 10) -> bytes:
    h = bytes.fromhex(beacon_hash)
    for _ in range(1 << min(iterations, 24)):
        h = hashlib.sha256(h).digest()
    return contribute(mpc, entropy=h.hex())


def _scale1(pt: Optional[PointG1], k: int) -> Optional[PointG1]:
    return None if pt is None or pt.infinity else pt * k


def verify(
    mpc: MPCParameters, r1cs: R1CS, radix: Phase1Radix, rng=None
) -> List[bytes]:
    """Replay the chain: rebuild the initial parameters from (circuit,
    radix), check every contribution's proof of knowledge and delta ratio,
    and check the final h/l queries against the initial ones with a
    random-combination same-ratio test (phase2's merge_pairs check).
    Returns the list of contribution hashes; raises ValueError on failure."""
    curve = mpc.curve
    initial = initialize(r1cs, radix)
    if initial.cs_hash != mpc.cs_hash:
        raise ValueError("cs_hash mismatch: wrong circuit or radix")
    params = mpc.params
    g2 = g2_group(curve).generator()

    # immutable sections must match the initial build exactly
    init_p = initial.params
    for fieldname in ("alpha_g1", "beta_g1"):
        if getattr(params, fieldname) != getattr(init_p, fieldname):
            raise ValueError(f"{fieldname} tampered")
    for fieldname in ("beta_g2", "gamma_g2"):
        if g2_to_bytes(curve, getattr(params, fieldname)) != g2_to_bytes(
            curve, getattr(init_p, fieldname)
        ):
            raise ValueError(f"{fieldname} tampered")
    if [g1_to_bytes(curve, pt) for pt in params.ic] != [
        g1_to_bytes(curve, pt) for pt in init_p.ic
    ]:
        raise ValueError("ic tampered")
    for name in ("a", "b_g1"):
        if [g1_to_bytes(curve, pt) for pt in getattr(params, name)] != [
            g1_to_bytes(curve, pt) for pt in getattr(init_p, name)
        ]:
            raise ValueError(f"{name} query tampered")
    if [g2_to_bytes(curve, pt) for pt in params.b_g2] != [
        g2_to_bytes(curve, pt) for pt in init_p.b_g2
    ]:
        raise ValueError("b_g2 query tampered")

    hashes = []
    delta_prev = init_p.delta_g1  # = G1 generator
    seen: List[PublicKey] = []
    for pk in mpc.contributions:
        # recompute the transcript this contribution must have committed to
        h = hashlib.blake2b(digest_size=64)
        h.update(mpc.cs_hash)
        for prior in seen:
            h.update(prior.to_bytes(curve))
        h.update(g1_to_bytes(curve, pk.s))
        h.update(g1_to_bytes(curve, pk.s_delta))
        if h.digest() != pk.transcript:
            raise ValueError("transcript mismatch")
        r_pt = _hash_to_g2(curve, pk.transcript)
        # proof of knowledge: e(s_delta, r) == e(s, r_delta)
        if not _same_ratio(curve, pk.s, pk.s_delta, r_pt, pk.r_delta):
            raise ValueError("invalid proof of knowledge")
        # delta progression: e(delta_after, r) == e(delta_prev, r_delta)
        if not _same_ratio(curve, delta_prev, pk.delta_after, r_pt, pk.r_delta):
            raise ValueError("invalid delta transition")
        delta_prev = pk.delta_after
        seen.append(pk)
        hashes.append(
            hashlib.blake2b(pk.to_bytes(curve), digest_size=64).digest()
        )
    if delta_prev != params.delta_g1:
        raise ValueError("final delta_g1 does not match the chain")
    # delta_g2 consistency: e(delta_g1, G2) == e(G1, delta_g2)
    g1 = g1_group(curve).generator()
    if not pairing_product_is_one(
        curve, [(params.delta_g1, g2), (-g1, params.delta_g2)]
    ):
        raise ValueError("delta_g2 inconsistent with delta_g1")
    # h/l queries = initial ones scaled by delta^{-1}: random-combination
    # same-ratio check  e(sum rho_i P_i, delta_g2) == e(sum rho_i P0_i, G2)
    rand = rng or (lambda: secrets.randbelow(P.SCALAR_FIELDS[curve].p))
    for cur, init in ((params.h, init_p.h), (params.l, init_p.l)):
        if len(cur) != len(init):
            raise ValueError("query length changed")
        if not cur:
            continue
        rhos = [rand() for _ in cur]
        comb_cur = _lincomb(cur, rhos)
        comb_init = _lincomb(init, rhos)
        if comb_cur is None or comb_init is None:
            if comb_cur is not comb_init:
                raise ValueError("query tampered (zero combination)")
            continue
        if not pairing_product_is_one(
            curve, [(comb_cur, params.delta_g2), (-comb_init, g2)]
        ):
            raise ValueError("h/l queries inconsistent with delta")
    return hashes


def _lincomb(points: List[Optional[PointG1]], rhos: List[int]) -> Optional[PointG1]:
    acc = None
    for pt, rho in zip(points, rhos):
        if pt is None or pt.infinity or rho == 0:
            continue
        term = pt * rho
        acc = term if acc is None else acc + term
    return acc


def _same_ratio(curve: str, a1: PointG1, b1: PointG1, a2: PointG2, b2: PointG2) -> bool:
    """e(b1, a2) == e(a1, b2) — (a1 : b1) and (a2 : b2) share a ratio."""
    return pairing_product_is_one(curve, [(b1, a2), (-a1, b2)])


def export_keypair(mpc: MPCParameters, r1cs: R1CS):
    """Final (ProvingKey, VerificationKey) in our native key types, ready
    for schemes.groth16.prove/verify (reference: export_keypair,
    zokrates_bellman/src/groth16.rs:152-159).

    The bellman query layout differs from ark's only in which element set
    carries gamma (fixed to 1 here), so the exported vk verifies with the
    standard Groth16 equation."""
    from ..schemes.groth16 import ProvingKey, _pack_query, _pack_query_dummied
    from ..schemes.types import VerificationKey, g1_to_json, g2_to_json
    import numpy as np
    import jax

    curve = mpc.curve
    params = mpc.params
    ni = r1cs.num_instance
    m = r1cs.num_variables
    nc = r1cs.num_constraints
    n = 1 << max(1, (nc + ni - 1).bit_length())

    def tup(pt):
        return None if pt is None or pt.infinity else (pt.x, pt.y)

    a_full = [tup(pt) for pt in params.a]
    b1_full = [tup(pt) for pt in params.b_g1]
    l_full = [None] * ni + [tup(pt) for pt in params.l]
    h_pts = [tup(pt) for pt in params.h]

    a_p128, a_mask, corr_a = _pack_query_dummied(curve, a_full)
    b1_p128, b_mask, corr_b = _pack_query_dummied(curve, b1_full)
    l_p128, l_mask, corr_l = _pack_query_dummied(curve, l_full)
    h_p128, _ = _pack_query(curve, [pt if pt else (0, 0) for pt in h_pts])

    from ..fields.limbs import n_limbs
    from ..kernels.msm_sorted import pack_points_g2
    import jax.numpy as jnp
    from ..fields.jfield import field_ops

    q = P.BASE_FIELDS[curve].p
    fq = field_ops(q)
    g2grp = g2_group(curve)

    def g2_coords(pt):
        if pt is None or pt.infinity:
            z = g2grp.generator()  # dummy; masked out
            return z
        return pt

    xs = [[g2_coords(pt).x.c0, g2_coords(pt).x.c1] for pt in params.b_g2]
    ys = [[g2_coords(pt).y.c0, g2_coords(pt).y.c1] for pt in params.b_g2]
    b2x = np.asarray(
        jax.device_get(fq.encode([c for xy in xs for c in xy]))
    ).reshape(m, 2, -1)
    b2y = np.asarray(
        jax.device_get(fq.encode([c for xy in ys for c in xy]))
    ).reshape(m, 2, -1)
    nlq = n_limbs(q)
    if 6 * nlq <= 128:
        b2_p128 = np.asarray(
            jax.device_get(pack_points_g2(q, jnp.asarray(b2x), jnp.asarray(b2y)))
        )
        b2_xy = None
    else:
        b2_p128 = None
        b2_xy = (b2x, b2y)

    corr_w = np.stack([corr_a, corr_b, corr_l])
    pk = ProvingKey(
        curve=curve,
        domain_size=n,
        num_instance=ni,
        alpha_g1=params.alpha_g1,
        beta_g1=params.beta_g1,
        beta_g2=params.beta_g2,
        delta_g1=params.delta_g1,
        delta_g2=params.delta_g2,
        a_p128=a_p128,
        a_mask=a_mask,
        b1_p128=b1_p128,
        b1_mask=b_mask,
        b2_p128=b2_p128,
        b2_mask=np.asarray(
            [pt is not None and not pt.infinity for pt in params.b_g2], dtype=bool
        ),
        h_p128=h_p128,
        l_p128=l_p128,
        l_mask=l_mask,
        corr_w=corr_w,
        b2_xy=b2_xy,
        h16_p128=None,
    )
    vk = VerificationKey(
        "g16",
        curve,
        {
            "alpha": g1_to_json(params.alpha_g1, curve),
            "beta": g2_to_json(params.beta_g2, curve),
            "gamma": g2_to_json(params.gamma_g2, curve),
            "delta": g2_to_json(params.delta_g2, curve),
            "gamma_abc": [g1_to_json(pt, curve) for pt in params.ic],
        },
    )
    return pk, vk
