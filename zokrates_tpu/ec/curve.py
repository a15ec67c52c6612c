"""Short-Weierstrass curve groups (host-side, Python int coordinates).

Used by: trusted setup (SRS generation for small test circuits), proof
verification (paired with ec/pairing.py), serialization of proof points.
Bulk point arithmetic (MSM) runs on device via kernels/jec.py instead.

Curve configs mirror the reference support matrix
(zokrates_book/src/toolbox/proving_schemes.md): bn128, bls12_381,
bls12_377, bw6_761 (G2 over Fq), pallas, vesta.

Generator coordinates are standard published constants; the test-suite
checks on-curve membership and prime order for every one of them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional, Tuple, Union

from ..fields import params as P
from .tower import Fq2, TowerCtx


class PointG1:
    """Affine point over Fq; None coordinates = point at infinity."""

    __slots__ = ("curve", "x", "y")

    def __init__(self, curve: "CurveGroup", x: Optional[int], y: Optional[int]):
        self.curve = curve
        self.x = x if x is None else x % curve.q
        self.y = y if y is None else y % curve.q

    @property
    def infinity(self) -> bool:
        return self.x is None

    def is_on_curve(self) -> bool:
        if self.infinity:
            return True
        q, b, a = self.curve.q, self.curve.b, self.curve.a
        return (self.y * self.y - self.x**3 - a * self.x - b) % q == 0

    def __eq__(self, o):
        return self.x == o.x and self.y == o.y

    def __hash__(self):
        return hash((self.x, self.y))

    def __neg__(self):
        if self.infinity:
            return self
        return PointG1(self.curve, self.x, -self.y)

    def __add__(self, o: "PointG1") -> "PointG1":
        if self.infinity:
            return o
        if o.infinity:
            return self
        q = self.curve.q
        if self.x == o.x:
            if (self.y + o.y) % q == 0:
                return PointG1(self.curve, None, None)
            # doubling
            lam = (3 * self.x * self.x + self.curve.a) * pow(2 * self.y, -1, q) % q
        else:
            lam = (o.y - self.y) * pow(o.x - self.x, -1, q) % q
        x3 = (lam * lam - self.x - o.x) % q
        y3 = (lam * (self.x - x3) - self.y) % q
        return PointG1(self.curve, x3, y3)

    def __sub__(self, o):
        return self + (-o)

    def __mul__(self, k: int) -> "PointG1":
        k = int(k) % self.curve.r
        if k == 0 or self.infinity:
            return PointG1(self.curve, None, None)
        if self.curve.a:  # generic-a fallback: affine ladder
            acc = PointG1(self.curve, None, None)
            add = self
            while k:
                if k & 1:
                    acc = acc + add
                add = add + add
                k >>= 1
            return acc
        # a=0 fast path: Jacobian ladder, one final inversion
        from .jacobian import jac_mul, jac_to_affine

        q = self.curve.q
        aff = jac_to_affine(q, jac_mul(q, (self.x, self.y, 1), k))
        if aff is None:
            return PointG1(self.curve, None, None)
        return PointG1(self.curve, aff[0], aff[1])

    __rmul__ = __mul__

    def __repr__(self):
        return f"G1({self.x}, {self.y})" if not self.infinity else "G1(inf)"


class PointG2:
    """Affine point with Fq2 coordinates (or Fq for BW6-style G2 — then the
    coordinates are Fq2 with zero imaginary part handled by the caller)."""

    __slots__ = ("curve", "x", "y")

    def __init__(self, curve: "CurveGroup2", x: Optional[Fq2], y: Optional[Fq2]):
        self.curve = curve
        self.x = x
        self.y = y

    @property
    def infinity(self) -> bool:
        return self.x is None

    def is_on_curve(self) -> bool:
        if self.infinity:
            return True
        lhs = self.y * self.y
        rhs = self.x * self.x * self.x + self.curve.b2
        if self.curve.a:
            rhs = rhs + self.x * self.curve.a
        return lhs == rhs

    def __eq__(self, o):
        if self.infinity or o.infinity:
            return self.infinity and o.infinity
        return self.x == o.x and self.y == o.y

    def __neg__(self):
        if self.infinity:
            return self
        return PointG2(self.curve, self.x, -self.y)

    def __add__(self, o: "PointG2") -> "PointG2":
        if self.infinity:
            return o
        if o.infinity:
            return self
        if self.x == o.x:
            if (self.y + o.y).is_zero():
                return PointG2(self.curve, None, None)
            num = self.x * self.x * 3
            if self.curve.a:
                num = num + self.curve.a
            lam = num * (self.y * 2).inv()
        else:
            lam = (o.y - self.y) * (o.x - self.x).inv()
        x3 = lam * lam - self.x - o.x
        y3 = lam * (self.x - x3) - self.y
        return PointG2(self.curve, x3, y3)

    def __sub__(self, o):
        return self + (-o)

    def __mul__(self, k: int) -> "PointG2":
        k = int(k) % self.curve.r
        if k == 0 or self.infinity:
            return PointG2(self.curve, None, None)
        fast = (
            not self.curve.a
            and hasattr(self.x, "c0")
            and getattr(self.x, "ctx", None) is not None
        )
        if fast:
            # a=0 fast path: tuple-Fq2 Jacobian ladder, one final inversion
            from .jacobian import jac2_mul, jac2_to_affine

            q = self.curve.q
            beta = self.x.ctx.beta
            P = ((self.x.c0, self.x.c1), (self.y.c0, self.y.c1), (1, 0))
            aff = jac2_to_affine(q, beta, jac2_mul(q, beta, P, k))
            if aff is None:
                return PointG2(self.curve, None, None)
            from .tower import Fq2

            return PointG2(
                self.curve,
                Fq2(self.x.ctx, aff[0][0], aff[0][1]),
                Fq2(self.x.ctx, aff[1][0], aff[1][1]),
            )
        if not self.curve.a and isinstance(self.x, int):
            # BW6-style G2 over the base field: same a=0 G1 formulas
            from .jacobian import jac_mul, jac_to_affine

            q = self.curve.q
            aff = jac_to_affine(q, jac_mul(q, (self.x, self.y, 1), k))
            if aff is None:
                return PointG2(self.curve, None, None)
            return PointG2(self.curve, aff[0], aff[1])
        acc = PointG2(self.curve, None, None)
        add = self
        while k:
            if k & 1:
                acc = acc + add
            add = add + add
            k >>= 1
        return acc

    __rmul__ = __mul__

    def __repr__(self):
        return f"G2({self.x}, {self.y})" if not self.infinity else "G2(inf)"


@dataclass(frozen=True)
class CurveGroup:
    """G1: y^2 = x^3 + a x + b over Fq, prime order r."""

    name: str
    q: int
    r: int
    a: int
    b: int
    gx: int
    gy: int

    def generator(self) -> PointG1:
        return PointG1(self, self.gx, self.gy)

    def zero(self) -> PointG1:
        return PointG1(self, None, None)

    def point(self, x: int, y: int) -> PointG1:
        return PointG1(self, x, y)


@dataclass(frozen=True)
class CurveGroup2:
    """G2 over Fq2 (twist), same order r. a/b2 are Fq2 elements."""

    name: str
    q: int
    r: int
    tower: TowerCtx
    a: Optional[Fq2]
    b2: Fq2
    gx: Fq2
    gy: Fq2

    def generator(self) -> PointG2:
        return PointG2(self, self.gx, self.gy)

    def zero(self) -> PointG2:
        return PointG2(self, None, None)

    def point(self, x: Tuple[int, int], y: Tuple[int, int]) -> PointG2:
        return PointG2(self, Fq2(self.tower, *x), Fq2(self.tower, *y))


# ---------------------------------------------------------------------------
# Curve catalogue
# ---------------------------------------------------------------------------

# BN254
BN254_G1 = CurveGroup("bn128", P.BN254_Q, P.BN254_R, 0, 3, 1, 2)
BN254_TOWER = TowerCtx(q=P.BN254_Q, beta=P.BN254_Q - 1, xi=(9, 1))


def _bn254_g2() -> CurveGroup2:
    ctx = BN254_TOWER
    b2 = Fq2(ctx, 3, 0) * Fq2(ctx, 9, 1).inv()
    gx = Fq2(
        ctx,
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    )
    gy = Fq2(
        ctx,
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    )
    return CurveGroup2("bn128", P.BN254_Q, P.BN254_R, ctx, None, b2, gx, gy)


# BLS12-381
BLS12_381_G1 = CurveGroup(
    "bls12_381",
    P.BLS12_381_Q,
    P.BLS12_381_R,
    0,
    4,
    3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507,
    1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569,
)
BLS12_381_TOWER = TowerCtx(q=P.BLS12_381_Q, beta=P.BLS12_381_Q - 1, xi=(1, 1))


def _bls12_381_g2() -> CurveGroup2:
    ctx = BLS12_381_TOWER
    b2 = Fq2(ctx, 4, 4)
    gx = Fq2(
        ctx,
        352701069587466618187139116011060144890029952792775240219908644239793785735715026873347600343865175952761926303160,
        3059144344244213709971259814753781636986470325476647558659373206291635324768958432433509563104347017837885763365758,
    )
    gy = Fq2(
        ctx,
        1985150602287291935568054521177171638300868978215655730859378665066344726373823718423869104263333984641494340347905,
        927553665492332455747201965776037880757740193453592970025027978793976877002675564980949289727957565575433344219582,
    )
    return CurveGroup2("bls12_381", P.BLS12_381_Q, P.BLS12_381_R, ctx, None, b2, gx, gy)


# BLS12-377
BLS12_377_G1 = CurveGroup(
    "bls12_377",
    P.BLS12_377_Q,
    P.BLS12_377_R,
    0,
    1,
    81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695,
    241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030,
)
BLS12_377_TOWER = TowerCtx(q=P.BLS12_377_Q, beta=P.BLS12_377_Q - 5, xi=(0, 1))


def _bls12_377_g2() -> CurveGroup2:
    ctx = BLS12_377_TOWER
    # D-type twist: b' = b / xi = 1/u = -u/5
    b2 = Fq2(ctx, 1, 0) * Fq2(ctx, 0, 1).inv()
    gx = Fq2(
        ctx,
        233578398248691099356572568220835526895379068987715365179118596935057653620464273615301663571204657964920925606294,
        140913150380207355837477652521042157274541796891053068589147167627541651775299824604154852141315666357241556069118,
    )
    gy = Fq2(
        ctx,
        63160294768292073209381361943935198908131692476676907196754037919244929611450776219210369229519898517858833747423,
        149157405641012693445398062341192467754805999074082136895788947234480009303640899064710353187729182149407503257491,
    )
    return CurveGroup2("bls12_377", P.BLS12_377_Q, P.BLS12_377_R, ctx, None, b2, gx, gy)


# BW6-761: both G1 and G2 are over Fq (G2_TYPE = Fq in the reference,
# zokrates_field/src/lib.rs G2Type). G1: y^2 = x^3 - 1; G2: y^2 = x^3 + 4.
BW6_761_G1 = CurveGroup(
    "bw6_761",
    P.BW6_761_Q,
    P.BW6_761_R,
    0,
    P.BW6_761_Q - 1,
    6238772257594679368032145693622812838779005809760824733138787810501188623461307351759238099287535516224314149266511977132140828635950940021790489507611754366317801811090811367945064510304504157188661901055903167026722666149426237,
    2101735126520897423911504562215834951148127555913367997162789335052900271653517958562461315794228241561913734371411178226936527683203879553093934185950470971848972085321797958124416462268292467002957525517188485984766314758624099,
)
# G2 over Fq, order r: y^2 = x^3 + 4
BW6_761_G2 = CurveGroup(
    "bw6_761_g2",
    P.BW6_761_Q,
    P.BW6_761_R,
    0,
    4,
    6445332910596979336035888152774071626898886139774101364933948236926875073754470830732273879639675437155036544153105017729592600560631678554299562762294743927912429096636156401171909259073181112518725201388196280039960074422214428,
    562923658089539719386922163444547387757586534741080263946953401595155211934630598999300396317104182598044793758153214972605680357108252243146746187917218885078195819486220416605630144001533548163105316661692978285266378674355041,
)

# Pasta (no pairing; used for Nova IVC folding)
PALLAS_G1 = CurveGroup("pallas_curve", P.PASTA_FP, P.PASTA_FQ, 0, 5, P.PASTA_FP - 1, 2)
VESTA_G1 = CurveGroup("vesta_curve", P.PASTA_FQ, P.PASTA_FP, 0, 5, P.PASTA_FQ - 1, 2)


@lru_cache(maxsize=None)
def g1_group(curve: str) -> CurveGroup:
    return {
        "bn128": BN254_G1,
        "bls12_381": BLS12_381_G1,
        "bls12_377": BLS12_377_G1,
        "bw6_761": BW6_761_G1,
        "pallas": PALLAS_G1,
        "vesta": VESTA_G1,
    }[curve]


@lru_cache(maxsize=None)
def g2_group(curve: str):
    if curve == "bn128":
        return _bn254_g2()
    if curve == "bls12_381":
        return _bls12_381_g2()
    if curve == "bls12_377":
        return _bls12_377_g2()
    if curve == "bw6_761":
        return BW6_761_G2
    raise ValueError(f"no G2 for curve {curve}")


@lru_cache(maxsize=None)
def tower_ctx(curve: str) -> TowerCtx:
    return {
        "bn128": BN254_TOWER,
        "bls12_381": BLS12_381_TOWER,
        "bls12_377": BLS12_377_TOWER,
    }[curve]
