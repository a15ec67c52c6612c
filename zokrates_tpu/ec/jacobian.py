"""Host (python-int) Jacobian arithmetic for a=0 short-Weierstrass curves.

Shared by the MSM window combine (kernels/msm_sorted.py) and the host
point classes (ec/curve.py): scalar multiplication here costs ~20 bigint
muls per bit with ONE final inversion, vs the affine ladder's modular
inversion per add (~8.6 ms -> ~1.5 ms for a 254-bit G1 mult).

G1 points are (X, Y, Z) int triples, infinity = Z == 0.
Fq2 points use (c0, c1) int pairs per coordinate with the tower residue
beta (x^2 = beta): infinity = Z == (0, 0).
"""

from __future__ import annotations

from typing import Tuple

JacG1 = Tuple[int, int, int]

INF1: JacG1 = (1, 1, 0)


def jac_double(p: int, P: JacG1) -> JacG1:
    """dbl-2009-l, valid for a=0."""
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


def jac_add(p: int, P: JacG1, Q: JacG1) -> JacG1:
    """add-2007-bl with complete special cases."""
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
            return jac_double(p, P)
        return INF1
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


def jac_mul(p: int, P: JacG1, k: int) -> JacG1:
    """Left-to-right double-and-add over a Jacobian base."""
    if k == 0 or P[2] == 0:
        return INF1
    acc = INF1
    for bit in bin(k)[2:]:
        acc = jac_double(p, acc)
        if bit == "1":
            acc = jac_add(p, acc, P)
    return acc


def jac_to_affine(p: int, P: JacG1):
    X, Y, Z = P
    if Z == 0:
        return None
    zi = pow(Z, -1, p)
    zi2 = zi * zi % p
    return (X * zi2 % p, Y * zi2 % p * zi % p)


# --------------------------------------------------------------------------
# Fq2 variants (coordinates are (c0, c1) pairs; x^2 = beta)
# --------------------------------------------------------------------------

F2 = Tuple[int, int]
JacG2 = Tuple[F2, F2, F2]

INF2: JacG2 = ((1, 0), (1, 0), (0, 0))


def f2_mul(p: int, beta: int, a: F2, b: F2) -> F2:
    t0 = a[0] * b[0] % p
    t1 = a[1] * b[1] % p
    return ((t0 + beta * t1) % p, ((a[0] + a[1]) * (b[0] + b[1]) - t0 - t1) % p)


def f2_add(p: int, *xs: F2) -> F2:
    return (sum(x[0] for x in xs) % p, sum(x[1] for x in xs) % p)


def f2_sub(p: int, a: F2, b: F2) -> F2:
    return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)


def f2_scale(p: int, k: int, a: F2) -> F2:
    return (k * a[0] % p, k * a[1] % p)


def jac2_double(p: int, beta: int, P: JacG2) -> JacG2:
    X1, Y1, Z1 = P
    if Z1 == (0, 0):
        return P
    m = lambda a, b: f2_mul(p, beta, a, b)
    A = m(X1, X1)
    B = m(Y1, Y1)
    C = m(B, B)
    t = f2_add(p, X1, B)
    D = f2_scale(p, 2, f2_sub(p, f2_sub(p, m(t, t), A), C))
    E = f2_scale(p, 3, A)
    F = m(E, E)
    X3 = f2_sub(p, F, f2_scale(p, 2, D))
    Y3 = f2_sub(p, m(E, f2_sub(p, D, X3)), f2_scale(p, 8, C))
    Z3 = f2_scale(p, 2, m(Y1, Z1))
    return (X3, Y3, Z3)


def jac2_add(p: int, beta: int, P: JacG2, Q: JacG2) -> JacG2:
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    if Z1 == (0, 0):
        return Q
    if Z2 == (0, 0):
        return P
    m = lambda a, b: f2_mul(p, beta, a, b)
    Z1Z1 = m(Z1, Z1)
    Z2Z2 = m(Z2, Z2)
    U1 = m(X1, Z2Z2)
    U2 = m(X2, Z1Z1)
    S1 = m(m(Y1, Z2), Z2Z2)
    S2 = m(m(Y2, Z1), Z1Z1)
    if U1 == U2:
        if S1 == S2:
            return jac2_double(p, beta, P)
        return INF2
    H = f2_sub(p, U2, U1)
    Rr = f2_sub(p, S2, S1)
    H2 = f2_scale(p, 2, H)
    I = m(H2, H2)
    J = m(H, I)
    R2 = f2_scale(p, 2, Rr)
    V = m(U1, I)
    X3 = f2_sub(p, f2_sub(p, m(R2, R2), J), f2_scale(p, 2, V))
    Y3 = f2_sub(p, m(R2, f2_sub(p, V, X3)), f2_scale(p, 2, m(S1, J)))
    Zs = f2_add(p, Z1, Z2)
    Z3 = m(f2_sub(p, f2_sub(p, m(Zs, Zs), Z1Z1), Z2Z2), H)
    return (X3, Y3, Z3)


def jac2_mul(p: int, beta: int, P: JacG2, k: int) -> JacG2:
    if k == 0 or P[2] == (0, 0):
        return INF2
    acc = INF2
    for bit in bin(k)[2:]:
        acc = jac2_double(p, beta, acc)
        if bit == "1":
            acc = jac2_add(p, beta, acc, P)
    return acc


def comb_table_g1(p: int, aff, c: int = 4, windows: int = 64):
    """Fixed-base comb table: table[j][d] = d * 2^(c*j) * P (Jacobian).
    A k-bit scalar mult is then `windows` adds and NO doublings."""
    base = (aff[0], aff[1], 1)
    tbl = []
    for _ in range(windows):
        row = [INF1]
        for d in range(1, 1 << c):
            row.append(jac_add(p, row[d - 1], base))
        tbl.append(row)
        for _ in range(c):
            base = jac_double(p, base)
    return tbl


def comb_mul_g1(p: int, tbl, k: int, c: int = 4) -> JacG1:
    acc = INF1
    for j, row in enumerate(tbl):
        d = (k >> (c * j)) & ((1 << c) - 1)
        if d:
            acc = jac_add(p, acc, row[d])
    return acc


def comb_table_g2(p: int, beta: int, aff, c: int = 4, windows: int = 64):
    base = (aff[0], aff[1], (1, 0))
    tbl = []
    for _ in range(windows):
        row = [INF2]
        for d in range(1, 1 << c):
            row.append(jac2_add(p, beta, row[d - 1], base))
        tbl.append(row)
        for _ in range(c):
            base = jac2_double(p, beta, base)
    return tbl


def comb_mul_g2(p: int, beta: int, tbl, k: int, c: int = 4) -> JacG2:
    acc = INF2
    for j, row in enumerate(tbl):
        d = (k >> (c * j)) & ((1 << c) - 1)
        if d:
            acc = jac2_add(p, beta, acc, row[d])
    return acc


def jac2_to_affine(p: int, beta: int, P: JacG2):
    X, Y, Z = P
    if Z == (0, 0):
        return None
    # (c0 - c1 x)(c0 + c1 x) = c0^2 - beta c1^2: invert the norm
    norm = (Z[0] * Z[0] - beta * Z[1] * Z[1]) % p
    ni = pow(norm, -1, p)
    zi = (Z[0] * ni % p, -Z[1] * ni % p)
    zi2 = f2_mul(p, beta, zi, zi)
    zi3 = f2_mul(p, beta, zi2, zi)
    return (f2_mul(p, beta, X, zi2), f2_mul(p, beta, Y, zi3))
