"""Extension-field towers Fq2 / Fq6 / Fq12 for pairing computation.

Host-side (Python int) implementation: pairings run only at verification
time on a handful of elements, so clarity and exactness beat throughput here.
The tower follows the standard pairing-friendly layout:

    Fq2  = Fq[u]  / (u^2 - beta)
    Fq6  = Fq2[v] / (v^3 - xi)      xi in Fq2
    Fq12 = Fq6[w] / (w^2 - v)

parameterized per curve (reference delegates this to arkworks' ark-ff
tower; zokrates_ark/src/lib.rs pulls it in via the PairingEngine trait).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class TowerCtx:
    q: int            # base field modulus
    beta: int         # Fq2 nonresidue: u^2 = beta (mod q)
    xi: Tuple[int, int]  # Fq6 nonresidue in Fq2: v^3 = xi0 + xi1*u


class Fq2:
    __slots__ = ("ctx", "c0", "c1")

    def __init__(self, ctx: TowerCtx, c0: int, c1: int):
        self.ctx = ctx
        self.c0 = c0 % ctx.q
        self.c1 = c1 % ctx.q

    @staticmethod
    def zero(ctx):
        return Fq2(ctx, 0, 0)

    @staticmethod
    def one(ctx):
        return Fq2(ctx, 1, 0)

    def is_zero(self):
        return self.c0 == 0 and self.c1 == 0

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    def __hash__(self):
        return hash((self.c0, self.c1))

    def __add__(self, o):
        return Fq2(self.ctx, self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fq2(self.ctx, self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fq2(self.ctx, -self.c0, -self.c1)

    def __mul__(self, o):
        q, beta = self.ctx.q, self.ctx.beta
        if isinstance(o, int):
            return Fq2(self.ctx, self.c0 * o, self.c1 * o)
        a0, a1, b0, b1 = self.c0, self.c1, o.c0, o.c1
        t0 = a0 * b0
        t1 = a1 * b1
        # (a0 b1 + a1 b0) via Karatsuba
        t2 = (a0 + a1) * (b0 + b1) - t0 - t1
        return Fq2(self.ctx, t0 + beta * t1, t2)

    __rmul__ = __mul__

    def square(self):
        return self * self

    def conj(self):
        return Fq2(self.ctx, self.c0, -self.c1)

    def inv(self):
        q, beta = self.ctx.q, self.ctx.beta
        # norm = c0^2 - beta c1^2
        norm = (self.c0 * self.c0 - beta * self.c1 * self.c1) % q
        ninv = pow(norm, -1, q)
        return Fq2(self.ctx, self.c0 * ninv, -self.c1 * ninv)

    def pow(self, e: int):
        r = Fq2.one(self.ctx)
        b = self
        while e:
            if e & 1:
                r = r * b
            b = b * b
            e >>= 1
        return r

    def __repr__(self):
        return f"Fq2({self.c0}, {self.c1})"


class Fq6:
    __slots__ = ("ctx", "c0", "c1", "c2")

    def __init__(self, ctx, c0: Fq2, c1: Fq2, c2: Fq2):
        self.ctx, self.c0, self.c1, self.c2 = ctx, c0, c1, c2

    @staticmethod
    def zero(ctx):
        z = Fq2.zero(ctx)
        return Fq6(ctx, z, z, z)

    @staticmethod
    def one(ctx):
        return Fq6(ctx, Fq2.one(ctx), Fq2.zero(ctx), Fq2.zero(ctx))

    def _xi(self) -> Fq2:
        return Fq2(self.ctx, *self.ctx.xi)

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero() and self.c2.is_zero()

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1 and self.c2 == o.c2

    def __add__(self, o):
        return Fq6(self.ctx, self.c0 + o.c0, self.c1 + o.c1, self.c2 + o.c2)

    def __sub__(self, o):
        return Fq6(self.ctx, self.c0 - o.c0, self.c1 - o.c1, self.c2 - o.c2)

    def __neg__(self):
        return Fq6(self.ctx, -self.c0, -self.c1, -self.c2)

    def __mul__(self, o):
        if isinstance(o, Fq2):
            return Fq6(self.ctx, self.c0 * o, self.c1 * o, self.c2 * o)
        xi = self._xi()
        a0, a1, a2, b0, b1, b2 = self.c0, self.c1, self.c2, o.c0, o.c1, o.c2
        t0, t1, t2 = a0 * b0, a1 * b1, a2 * b2
        c0 = t0 + xi * ((a1 + a2) * (b1 + b2) - t1 - t2)
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1 + xi * t2
        c2 = (a0 + a2) * (b0 + b2) - t0 - t2 + t1
        return Fq6(self.ctx, c0, c1, c2)

    def square(self):
        return self * self

    def mul_by_v(self):
        """Multiply by v (the Fq6 generator): (c0,c1,c2) -> (xi*c2, c0, c1)."""
        return Fq6(self.ctx, self._xi() * self.c2, self.c0, self.c1)

    def inv(self):
        xi = self._xi()
        a0, a1, a2 = self.c0, self.c1, self.c2
        t0 = a0 * a0 - xi * (a1 * a2)
        t1 = xi * (a2 * a2) - a0 * a1
        t2 = a1 * a1 - a0 * a2
        denom = a0 * t0 + xi * (a2 * t1) + xi * (a1 * t2)
        # denom is in Fq (c1 == 0) mathematically; invert in Fq2 for safety
        dinv = denom.inv()
        return Fq6(self.ctx, t0 * dinv, t1 * dinv, t2 * dinv)


class Fq12:
    __slots__ = ("ctx", "c0", "c1")

    def __init__(self, ctx, c0: Fq6, c1: Fq6):
        self.ctx, self.c0, self.c1 = ctx, c0, c1

    @staticmethod
    def one(ctx):
        return Fq12(ctx, Fq6.one(ctx), Fq6.zero(ctx))

    @staticmethod
    def zero(ctx):
        return Fq12(ctx, Fq6.zero(ctx), Fq6.zero(ctx))

    def is_one(self):
        return self.c0 == Fq6.one(self.ctx) and self.c1.is_zero()

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    def __add__(self, o):
        return Fq12(self.ctx, self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fq12(self.ctx, self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fq12(self.ctx, -self.c0, -self.c1)

    def __mul__(self, o):
        a0, a1, b0, b1 = self.c0, self.c1, o.c0, o.c1
        t0 = a0 * b0
        t1 = a1 * b1
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1
        return Fq12(self.ctx, t0 + t1.mul_by_v(), c1)

    def square(self):
        return self * self

    def conj(self):
        """x^(q^6): conjugation over Fq6."""
        return Fq12(self.ctx, self.c0, -self.c1)

    def inv(self):
        t = (self.c0 * self.c0 - (self.c1 * self.c1).mul_by_v()).inv()
        return Fq12(self.ctx, self.c0 * t, -(self.c1 * t))

    def pow(self, e: int):
        if e < 0:
            return self.inv().pow(-e)
        r = Fq12.one(self.ctx)
        b = self
        while e:
            if e & 1:
                r = r * b
            b = b * b
            e >>= 1
        return r
