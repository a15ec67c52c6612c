/* Native host-side field/EC kernel for the prove tail.
 *
 * The TPU does the O(n) work (matvecs, NTTs, MSM walks); what remains on
 * the host per proof is O(W) bigint point math: the per-window combine
 * (W*c Jacobian doublings + W adds per MSM), a handful of fixed/variable
 * base scalar mults for the A/B/C randomization, and Montgomery decode of
 * the kernel's window sums. In pure Python that costs ~40-50 ms/proof —
 * comparable to the device time. This file is the C replacement: generic
 * n x 64-bit Montgomery arithmetic (CIOS), Jacobian point ops for a=0
 * short-Weierstrass curves over Fq and Fq2, windowed scalar mult, and the
 * window-combine loops, all ~100x Python speed.
 *
 * Mirrors the semantics of zokrates_tpu/kernels/msm_sorted.py
 * (combine_windows, _host_jac_*) and ec/jacobian.py; the reference's
 * equivalent lives inside arkworks (zokrates_ark), which we do not link.
 *
 * Interface: plain C ABI consumed via ctypes (no pybind11 in the image).
 * All field elements cross the boundary as little-endian u64 limb arrays;
 * window sums from the device cross as the kernel's u32 16-bit-limb rows.
 */

#include <stdint.h>
#include <string.h>

typedef uint64_t u64;
typedef uint32_t u32;
typedef unsigned __int128 u128;

#define MAXL 12 /* up to 768-bit moduli (bw6_761) */

typedef struct {
    int nl;          /* 64-bit limb count */
    u64 p[MAXL];     /* modulus, LE */
    u64 n0;          /* -p^{-1} mod 2^64 */
    u64 r2[MAXL];    /* R^2 mod p, R = 2^(64*nl) */
    u64 one[MAXL];   /* R mod p (Montgomery 1) */
    u64 beta[MAXL];  /* Fq2 nonresidue, Montgomery form */
    int has_beta;
} zkt_ctx;

/* ---------------- u64-limb integer helpers ---------------- */

static int ge_n(const u64 *a, const u64 *b, int nl) {
    for (int i = nl - 1; i >= 0; i--) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return 0;
    }
    return 1; /* equal */
}

static void sub_n(u64 *r, const u64 *a, const u64 *b, int nl) {
    u128 borrow = 0;
    for (int i = 0; i < nl; i++) {
        u128 t = (u128)a[i] - b[i] - borrow;
        r[i] = (u64)t;
        borrow = (t >> 64) & 1;
    }
}

static u64 add_n(u64 *r, const u64 *a, const u64 *b, int nl) {
    u128 carry = 0;
    for (int i = 0; i < nl; i++) {
        u128 t = (u128)a[i] + b[i] + carry;
        r[i] = (u64)t;
        carry = t >> 64;
    }
    return (u64)carry;
}

static int is_zero_n(const u64 *a, int nl) {
    for (int i = 0; i < nl; i++)
        if (a[i]) return 0;
    return 1;
}

/* ---------------- modular field ops (Montgomery) ---------------- */

static void fadd(const zkt_ctx *c, u64 *r, const u64 *a, const u64 *b) {
    u64 carry = add_n(r, a, b, c->nl);
    if (carry || ge_n(r, c->p, c->nl)) sub_n(r, r, c->p, c->nl);
}

static void fsub(const zkt_ctx *c, u64 *r, const u64 *a, const u64 *b) {
    if (ge_n(a, b, c->nl)) {
        sub_n(r, a, b, c->nl);
    } else {
        u64 t[MAXL];
        sub_n(t, b, a, c->nl);
        sub_n(r, c->p, t, c->nl);
    }
}

/* CIOS Montgomery multiplication: r = a*b*R^-1 mod p */
static void fmul(const zkt_ctx *c, u64 *r, const u64 *a, const u64 *b) {
    int nl = c->nl;
    u64 t[MAXL + 2];
    memset(t, 0, sizeof(u64) * (nl + 2));
    for (int i = 0; i < nl; i++) {
        /* t += a[i] * b */
        u128 carry = 0;
        for (int j = 0; j < nl; j++) {
            u128 s = (u128)a[i] * b[j] + t[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[nl] + carry;
        t[nl] = (u64)s;
        t[nl + 1] = (u64)(s >> 64);
        /* m = t[0] * n0; t += m * p; t >>= 64 */
        u64 m = t[0] * c->n0;
        carry = ((u128)m * c->p[0] + t[0]) >> 64;
        for (int j = 1; j < nl; j++) {
            u128 s2 = (u128)m * c->p[j] + t[j] + carry;
            t[j - 1] = (u64)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[nl] + carry;
        t[nl - 1] = (u64)s;
        t[nl] = t[nl + 1] + (u64)(s >> 64);
        t[nl + 1] = 0;
    }
    if (t[nl] || ge_n(t, c->p, nl)) sub_n(r, t, c->p, nl);
    else memcpy(r, t, sizeof(u64) * nl);
}

static void fsqr(const zkt_ctx *c, u64 *r, const u64 *a) { fmul(c, r, a, a); }

static void fcopy(u64 *r, const u64 *a, int nl) { memcpy(r, a, sizeof(u64) * nl); }

static void fzero(u64 *r, int nl) { memset(r, 0, sizeof(u64) * nl); }

/* r = a^e mod p (Montgomery in/out), e as LE limb array */
static void fpow(const zkt_ctx *c, u64 *r, const u64 *a, const u64 *e, int el) {
    u64 acc[MAXL], base[MAXL];
    fcopy(acc, c->one, c->nl);
    fcopy(base, a, c->nl);
    int bits = el * 64;
    while (bits > 0 && !((e[(bits - 1) / 64] >> ((bits - 1) % 64)) & 1)) bits--;
    for (int i = 0; i < bits; i++) {
        if ((e[i / 64] >> (i % 64)) & 1) fmul(c, acc, acc, base);
        fsqr(c, base, base);
    }
    fcopy(r, acc, c->nl);
}

/* Montgomery inverse via Fermat: a^(p-2) */
static void finv(const zkt_ctx *c, u64 *r, const u64 *a) {
    u64 e[MAXL], two[MAXL];
    fzero(two, c->nl);
    two[0] = 2;
    sub_n(e, c->p, two, c->nl);
    fpow(c, r, a, e, c->nl);
}

/* ---------------- Fq2 ops: x = (c0, c1), u^2 = beta ---------------- */

typedef struct {
    u64 c0[MAXL];
    u64 c1[MAXL];
} f2;

static void f2add(const zkt_ctx *c, f2 *r, const f2 *a, const f2 *b) {
    fadd(c, r->c0, a->c0, b->c0);
    fadd(c, r->c1, a->c1, b->c1);
}

static void f2sub(const zkt_ctx *c, f2 *r, const f2 *a, const f2 *b) {
    fsub(c, r->c0, a->c0, b->c0);
    fsub(c, r->c1, a->c1, b->c1);
}

static void f2mul(const zkt_ctx *c, f2 *r, const f2 *a, const f2 *b) {
    u64 t0[MAXL], t1[MAXL], s0[MAXL], s1[MAXL], u[MAXL];
    fmul(c, t0, a->c0, b->c0);
    fmul(c, t1, a->c1, b->c1);
    fadd(c, s0, a->c0, a->c1);
    fadd(c, s1, b->c0, b->c1);
    fmul(c, u, s0, s1);
    fsub(c, u, u, t0);
    fsub(c, r->c1, u, t1);
    fmul(c, u, c->beta, t1);
    fadd(c, r->c0, t0, u);
}

static void f2sqr(const zkt_ctx *c, f2 *r, const f2 *a) { f2mul(c, r, a, a); }

static int f2zero_p(const zkt_ctx *c, const f2 *a) {
    return is_zero_n(a->c0, c->nl) && is_zero_n(a->c1, c->nl);
}

static void f2zero(const zkt_ctx *c, f2 *r) {
    fzero(r->c0, c->nl);
    fzero(r->c1, c->nl);
}

static void f2inv(const zkt_ctx *c, f2 *r, const f2 *a) {
    /* 1/(c0 + c1 u) = (c0 - c1 u) / (c0^2 - beta c1^2) */
    u64 t0[MAXL], t1[MAXL], d[MAXL];
    fsqr(c, t0, a->c0);
    fsqr(c, t1, a->c1);
    fmul(c, t1, t1, c->beta);
    fsub(c, d, t0, t1);
    finv(c, d, d);
    fmul(c, r->c0, a->c0, d);
    fmul(c, t0, a->c1, d);
    fsub(c, r->c1, c->p, t0); /* negate; p - x works for x != 0 */
    if (is_zero_n(t0, c->nl)) fzero(r->c1, c->nl);
}

/* ---------------- G1 Jacobian (a = 0) ---------------- */

typedef struct {
    u64 X[MAXL], Y[MAXL], Z[MAXL];
} g1;

static int g1_inf(const zkt_ctx *c, const g1 *P) { return is_zero_n(P->Z, c->nl); }

static void g1_set_inf(const zkt_ctx *c, g1 *P) {
    fcopy(P->X, c->one, c->nl);
    fcopy(P->Y, c->one, c->nl);
    fzero(P->Z, c->nl);
}

static void g1_dbl(const zkt_ctx *c, g1 *R, const g1 *P) {
    if (g1_inf(c, P)) { *R = *P; return; }
    u64 A[MAXL], B[MAXL], C[MAXL], D[MAXL], E[MAXL], F[MAXL], t[MAXL];
    fsqr(c, A, P->X);
    fsqr(c, B, P->Y);
    fsqr(c, C, B);
    fadd(c, t, P->X, B);
    fsqr(c, t, t);
    fsub(c, t, t, A);
    fsub(c, t, t, C);
    fadd(c, D, t, t);
    fadd(c, E, A, A);
    fadd(c, E, E, A);
    fsqr(c, F, E);
    fadd(c, t, D, D);
    fsub(c, R->X, F, t);
    fadd(c, C, C, C);
    fadd(c, C, C, C);
    fadd(c, C, C, C);
    fsub(c, t, D, R->X);
    fmul(c, t, E, t);
    fmul(c, D, P->Y, P->Z); /* reuse D: Y1*Z1 (safe: D dead) */
    fsub(c, R->Y, t, C);
    fadd(c, R->Z, D, D);
}

static void g1_add(const zkt_ctx *c, g1 *R, const g1 *P, const g1 *Q) {
    if (g1_inf(c, P)) { *R = *Q; return; }
    if (g1_inf(c, Q)) { *R = *P; return; }
    u64 Z1Z1[MAXL], Z2Z2[MAXL], U1[MAXL], U2[MAXL], S1[MAXL], S2[MAXL];
    fsqr(c, Z1Z1, P->Z);
    fsqr(c, Z2Z2, Q->Z);
    fmul(c, U1, P->X, Z2Z2);
    fmul(c, U2, Q->X, Z1Z1);
    fmul(c, S1, P->Y, Q->Z);
    fmul(c, S1, S1, Z2Z2);
    fmul(c, S2, Q->Y, P->Z);
    fmul(c, S2, S2, Z1Z1);
    if (!memcmp(U1, U2, sizeof(u64) * c->nl)) {
        if (!memcmp(S1, S2, sizeof(u64) * c->nl)) { g1_dbl(c, R, P); return; }
        g1_set_inf(c, R);
        return;
    }
    u64 H[MAXL], I[MAXL], J[MAXL], r2[MAXL], V[MAXL], t[MAXL];
    fsub(c, H, U2, U1);
    fadd(c, I, H, H);
    fsqr(c, I, I);
    fmul(c, J, H, I);
    fsub(c, r2, S2, S1);
    fadd(c, r2, r2, r2);
    fmul(c, V, U1, I);
    fsqr(c, t, r2);
    fsub(c, t, t, J);
    fsub(c, t, t, V);
    fsub(c, R->X, t, V);
    fsub(c, t, V, R->X);
    fmul(c, t, r2, t);
    fmul(c, S1, S1, J);
    fadd(c, S1, S1, S1);
    fsub(c, R->Y, t, S1);
    fadd(c, t, P->Z, Q->Z);
    fsqr(c, t, t);
    fsub(c, t, t, Z1Z1);
    fsub(c, t, t, Z2Z2);
    fmul(c, R->Z, t, H);
}

/* windowed (4-bit) variable-base scalar mult; k LE limbs, kl limbs */
static void g1_mul(const zkt_ctx *c, g1 *R, const g1 *P, const u64 *k, int kl) {
    g1 tbl[16];
    g1_set_inf(c, &tbl[0]);
    tbl[1] = *P;
    for (int i = 2; i < 16; i++) g1_add(c, &tbl[i], &tbl[i - 1], P);
    int bits = kl * 64;
    while (bits > 0 && !((k[(bits - 1) / 64] >> ((bits - 1) % 64)) & 1)) bits--;
    g1 acc;
    g1_set_inf(c, &acc);
    int start = ((bits + 3) / 4) * 4;
    for (int i = start - 4; i >= 0; i -= 4) {
        for (int d = 0; d < 4; d++) g1_dbl(c, &acc, &acc);
        int limb = i / 64, sh = i % 64;
        u64 w = (limb < kl) ? ((k[limb] >> sh) & 0xF) : 0;
        if (sh > 60 && limb + 1 < kl)
            w |= (k[limb + 1] << (64 - sh)) & 0xF;
        if (w) g1_add(c, &acc, &acc, &tbl[w]);
    }
    *R = acc;
}

/* ---------------- G2 Jacobian over Fq2 (a = 0) ---------------- */

typedef struct {
    f2 X, Y, Z;
} g2;

static int g2_inf(const zkt_ctx *c, const g2 *P) { return f2zero_p(c, &P->Z); }

static void g2_set_inf(const zkt_ctx *c, g2 *P) {
    f2zero(c, &P->X);
    fcopy(P->X.c0, c->one, c->nl);
    f2zero(c, &P->Y);
    fcopy(P->Y.c0, c->one, c->nl);
    f2zero(c, &P->Z);
}

static void g2_dbl(const zkt_ctx *c, g2 *R, const g2 *P) {
    if (g2_inf(c, P)) { *R = *P; return; }
    f2 A, B, C, D, E, F, t;
    f2sqr(c, &A, &P->X);
    f2sqr(c, &B, &P->Y);
    f2sqr(c, &C, &B);
    f2add(c, &t, &P->X, &B);
    f2sqr(c, &t, &t);
    f2sub(c, &t, &t, &A);
    f2sub(c, &t, &t, &C);
    f2add(c, &D, &t, &t);
    f2add(c, &E, &A, &A);
    f2add(c, &E, &E, &A);
    f2sqr(c, &F, &E);
    f2add(c, &t, &D, &D);
    f2sub(c, &R->X, &F, &t);
    f2add(c, &C, &C, &C);
    f2add(c, &C, &C, &C);
    f2add(c, &C, &C, &C);
    f2sub(c, &t, &D, &R->X);
    f2mul(c, &t, &E, &t);
    f2mul(c, &D, &P->Y, &P->Z);
    f2sub(c, &R->Y, &t, &C);
    f2add(c, &R->Z, &D, &D);
}

static void g2_add(const zkt_ctx *c, g2 *R, const g2 *P, const g2 *Q) {
    if (g2_inf(c, P)) { *R = *Q; return; }
    if (g2_inf(c, Q)) { *R = *P; return; }
    f2 Z1Z1, Z2Z2, U1, U2, S1, S2;
    f2sqr(c, &Z1Z1, &P->Z);
    f2sqr(c, &Z2Z2, &Q->Z);
    f2mul(c, &U1, &P->X, &Z2Z2);
    f2mul(c, &U2, &Q->X, &Z1Z1);
    f2mul(c, &S1, &P->Y, &Q->Z);
    f2mul(c, &S1, &S1, &Z2Z2);
    f2mul(c, &S2, &Q->Y, &P->Z);
    f2mul(c, &S2, &S2, &Z1Z1);
    size_t nb = sizeof(u64) * c->nl; /* only nl limbs are significant */
    if (!memcmp(U1.c0, U2.c0, nb) && !memcmp(U1.c1, U2.c1, nb)) {
        if (!memcmp(S1.c0, S2.c0, nb) && !memcmp(S1.c1, S2.c1, nb)) {
            g2_dbl(c, R, P);
            return;
        }
        g2_set_inf(c, R);
        return;
    }
    f2 H, I, J, r2, V, t;
    f2sub(c, &H, &U2, &U1);
    f2add(c, &I, &H, &H);
    f2sqr(c, &I, &I);
    f2mul(c, &J, &H, &I);
    f2sub(c, &r2, &S2, &S1);
    f2add(c, &r2, &r2, &r2);
    f2mul(c, &V, &U1, &I);
    f2sqr(c, &t, &r2);
    f2sub(c, &t, &t, &J);
    f2sub(c, &t, &t, &V);
    f2sub(c, &R->X, &t, &V);
    f2sub(c, &t, &V, &R->X);
    f2mul(c, &t, &r2, &t);
    f2mul(c, &S1, &S1, &J);
    f2add(c, &S1, &S1, &S1);
    f2sub(c, &R->Y, &t, &S1);
    f2add(c, &t, &P->Z, &Q->Z);
    f2sqr(c, &t, &t);
    f2sub(c, &t, &t, &Z1Z1);
    f2sub(c, &t, &t, &Z2Z2);
    f2mul(c, &R->Z, &t, &H);
}

static void g2_mul(const zkt_ctx *c, g2 *R, const g2 *P, const u64 *k, int kl) {
    g2 tbl[16];
    g2_set_inf(c, &tbl[0]);
    tbl[1] = *P;
    for (int i = 2; i < 16; i++) g2_add(c, &tbl[i], &tbl[i - 1], P);
    int bits = kl * 64;
    while (bits > 0 && !((k[(bits - 1) / 64] >> ((bits - 1) % 64)) & 1)) bits--;
    g2 acc;
    g2_set_inf(c, &acc);
    int start = ((bits + 3) / 4) * 4;
    for (int i = start - 4; i >= 0; i -= 4) {
        for (int d = 0; d < 4; d++) g2_dbl(c, &acc, &acc);
        int limb = i / 64, sh = i % 64;
        u64 w = (limb < kl) ? ((k[limb] >> sh) & 0xF) : 0;
        if (sh > 60 && limb + 1 < kl)
            w |= (k[limb + 1] << (64 - sh)) & 0xF;
        if (w) g2_add(c, &acc, &acc, &tbl[w]);
    }
    *R = acc;
}

/* ---------------- exported API (ctypes) ---------------- */

/* ctx init: p as LE u64 limbs. Computes n0, R^2, R mod p. */
int zkt_ctx_init(zkt_ctx *c, const u64 *p, int nl) {
    if (nl < 1 || nl > MAXL || !(p[0] & 1)) return -1;
    c->nl = nl;
    memcpy(c->p, p, sizeof(u64) * nl);
    memset(c->p + nl, 0, sizeof(u64) * (MAXL - nl));
    /* n0 = -p^{-1} mod 2^64 by Newton iteration */
    u64 inv = 1;
    for (int i = 0; i < 6; i++) inv *= 2 - p[0] * inv;
    c->n0 = (u64)(0 - inv);
    /* one = R mod p: start from p's complement trick — compute 2^(64nl)
     * mod p by doubling 1, 64*nl times */
    u64 t[MAXL];
    fzero(t, nl);
    t[0] = 1;
    /* reduce 1 (already < p) then double 64*nl times */
    for (int i = 0; i < 64 * nl; i++) fadd(c, t, t, t);
    memcpy(c->one, t, sizeof(u64) * nl);
    /* r2 = R^2 mod p: double one 64*nl more times */
    for (int i = 0; i < 64 * nl; i++) fadd(c, t, t, t);
    memcpy(c->r2, t, sizeof(u64) * nl);
    c->has_beta = 0;
    return 0;
}

int zkt_ctx_size(void) { return (int)sizeof(zkt_ctx); }

/* beta: canonical LE limbs (already reduced mod p) */
void zkt_ctx_set_beta(zkt_ctx *c, const u64 *beta) {
    u64 t[MAXL];
    memcpy(t, beta, sizeof(u64) * c->nl);
    fmul(c, c->beta, t, c->r2); /* to Montgomery */
    c->has_beta = 1;
}

void zkt_to_mont(const zkt_ctx *c, u64 *r, const u64 *a) { fmul(c, r, a, c->r2); }

void zkt_from_mont(const zkt_ctx *c, u64 *r, const u64 *a) {
    u64 one_can[MAXL];
    fzero(one_can, c->nl);
    one_can[0] = 1;
    fmul(c, r, a, one_can);
}

void zkt_fmul(const zkt_ctx *c, u64 *r, const u64 *a, const u64 *b) { fmul(c, r, a, b); }
void zkt_fadd(const zkt_ctx *c, u64 *r, const u64 *a, const u64 *b) { fadd(c, r, a, b); }
void zkt_fsub(const zkt_ctx *c, u64 *r, const u64 *a, const u64 *b) { fsub(c, r, a, b); }
void zkt_finv(const zkt_ctx *c, u64 *r, const u64 *a) { finv(c, r, a); }

/* -------- u32 16-bit-limb (device layout) -> u64 Montgomery -------- */

/* rows: (count, nl16) u32 with 16-bit limbs, LSB first; nl16 == 4*nl. */
static void row_to_u64(const u32 *row, int nl16, u64 *out) {
    int nl = nl16 / 4;
    for (int i = 0; i < nl; i++) {
        out[i] = (u64)(row[4 * i] & 0xFFFF) | ((u64)(row[4 * i + 1] & 0xFFFF) << 16) |
                 ((u64)(row[4 * i + 2] & 0xFFFF) << 32) |
                 ((u64)(row[4 * i + 3] & 0xFFFF) << 48);
    }
}

/* window combine: acc = sum_w 2^(c*w) * S_w over Jacobian window sums.
 * wX/wY/wZ: (W, nl16) u32 Montgomery 16-bit-limb rows (device output).
 * out: 3*nl u64 canonical Jacobian coords. */
void zkt_combine_windows(const zkt_ctx *c, const u32 *wX, const u32 *wY,
                         const u32 *wZ, int W, int nl16, int cbits, u64 *out) {
    g1 acc, P;
    g1_set_inf(c, &acc);
    for (int w = W - 1; w >= 0; w--) {
        for (int d = 0; d < cbits; d++) g1_dbl(c, &acc, &acc);
        row_to_u64(wX + (size_t)w * nl16, nl16, P.X);
        row_to_u64(wY + (size_t)w * nl16, nl16, P.Y);
        row_to_u64(wZ + (size_t)w * nl16, nl16, P.Z);
        g1_add(c, &acc, &acc, &P);
    }
    zkt_from_mont(c, out, acc.X);
    zkt_from_mont(c, out + c->nl, acc.Y);
    zkt_from_mont(c, out + 2 * c->nl, acc.Z);
}

/* Fq2 window combine: rows pack [c0 limbs | c1 limbs] per coordinate
 * (2*nl16 u32 per row). out: 6*nl u64 canonical (X0,X1,Y0,Y1,Z0,Z1). */
void zkt_combine_windows2(const zkt_ctx *c, const u32 *wX, const u32 *wY,
                          const u32 *wZ, int W, int nl16, int cbits, u64 *out) {
    g2 acc, P;
    g2_set_inf(c, &acc);
    for (int w = W - 1; w >= 0; w--) {
        for (int d = 0; d < cbits; d++) g2_dbl(c, &acc, &acc);
        const u32 *rx = wX + (size_t)w * 2 * nl16;
        const u32 *ry = wY + (size_t)w * 2 * nl16;
        const u32 *rz = wZ + (size_t)w * 2 * nl16;
        row_to_u64(rx, nl16, P.X.c0);
        row_to_u64(rx + nl16, nl16, P.X.c1);
        row_to_u64(ry, nl16, P.Y.c0);
        row_to_u64(ry + nl16, nl16, P.Y.c1);
        row_to_u64(rz, nl16, P.Z.c0);
        row_to_u64(rz + nl16, nl16, P.Z.c1);
        g2_add(c, &acc, &acc, &P);
    }
    zkt_from_mont(c, out, acc.X.c0);
    zkt_from_mont(c, out + c->nl, acc.X.c1);
    zkt_from_mont(c, out + 2 * c->nl, acc.Y.c0);
    zkt_from_mont(c, out + 3 * c->nl, acc.Y.c1);
    zkt_from_mont(c, out + 4 * c->nl, acc.Z.c0);
    zkt_from_mont(c, out + 5 * c->nl, acc.Z.c1);
}

static void g2_load(const zkt_ctx *c, g2 *P, const u64 *b);
static void g2_store(const zkt_ctx *c, const g2 *P, u64 *b);

/* sparse window MSM: sum_i |d_i| * P_{idx_i} with sign-selected y.
 * rows: packed (., row_stride u32) device rows [x|y|-y|pad] in Montgomery
 * 16-bit limbs (the MSM kernel layout). digits < 2^15. out: canonical
 * Jacobian. Used for the ultra-sparse witness windows the device walk
 * would pad to its 4096-slot floor. */
void zkt_sparse_window_g1(const zkt_ctx *c, const u32 *rows, int row_stride,
                          int nl16, const int32_t *idx, const u32 *digits,
                          const u32 *signs, int k, u64 *out) {
    g1 acc, P, T;
    g1_set_inf(c, &acc);
    for (int i = 0; i < k; i++) {
        const u32 *row = rows + (size_t)idx[i] * row_stride;
        row_to_u64(row, nl16, P.X);
        row_to_u64(row + (signs[i] ? 2 * nl16 : nl16), nl16, P.Y);
        fcopy(P.Z, c->one, c->nl);
        u32 d = digits[i];
        if (d == 1) {
            g1_add(c, &acc, &acc, &P);
            continue;
        }
        /* double-and-add over the bits of d (msb first) */
        g1_set_inf(c, &T);
        for (int b = 31 - __builtin_clz(d); b >= 0; b--) {
            g1_dbl(c, &T, &T);
            if ((d >> b) & 1) g1_add(c, &T, &T, &P);
        }
        g1_add(c, &acc, &acc, &T);
    }
    zkt_from_mont(c, out, acc.X);
    zkt_from_mont(c, out + c->nl, acc.Y);
    zkt_from_mont(c, out + 2 * c->nl, acc.Z);
}

/* G2 rows pack [x.c0|x.c1|y.c0|y.c1|-y.c0|-y.c1|pad]. */
void zkt_sparse_window_g2(const zkt_ctx *c, const u32 *rows, int row_stride,
                          int nl16, const int32_t *idx, const u32 *digits,
                          const u32 *signs, int k, u64 *out) {
    g2 acc, P, T;
    g2_set_inf(c, &acc);
    for (int i = 0; i < k; i++) {
        const u32 *row = rows + (size_t)idx[i] * row_stride;
        row_to_u64(row, nl16, P.X.c0);
        row_to_u64(row + nl16, nl16, P.X.c1);
        const u32 *yy = row + (signs[i] ? 4 * nl16 : 2 * nl16);
        row_to_u64(yy, nl16, P.Y.c0);
        row_to_u64(yy + nl16, nl16, P.Y.c1);
        fcopy(P.Z.c0, c->one, c->nl);
        fzero(P.Z.c1, c->nl);
        u32 d = digits[i];
        if (d == 1) {
            g2_add(c, &acc, &acc, &P);
            continue;
        }
        g2_set_inf(c, &T);
        for (int b = 31 - __builtin_clz(d); b >= 0; b--) {
            g2_dbl(c, &T, &T);
            if ((d >> b) & 1) g2_add(c, &T, &T, &P);
        }
        g2_add(c, &acc, &acc, &T);
    }
    g2_store(c, &acc, out);
}

/* k successive doublings: out = 2^k * P (canonical Jacobian in/out) */
void zkt_g1_shift(const zkt_ctx *c, const u64 *xyz, int k, u64 *out) {
    g1 P;
    zkt_to_mont(c, P.X, xyz);
    zkt_to_mont(c, P.Y, xyz + c->nl);
    zkt_to_mont(c, P.Z, xyz + 2 * c->nl);
    for (int i = 0; i < k; i++) g1_dbl(c, &P, &P);
    zkt_from_mont(c, out, P.X);
    zkt_from_mont(c, out + c->nl, P.Y);
    zkt_from_mont(c, out + 2 * c->nl, P.Z);
}

void zkt_g2_shift(const zkt_ctx *c, const u64 *xyz, int k, u64 *out) {
    g2 P;
    g2_load(c, &P, xyz);
    for (int i = 0; i < k; i++) g2_dbl(c, &P, &P);
    g2_store(c, &P, out);
}

/* ---- point API: canonical affine/Jacobian u64 limb buffers ----
 * G1 Jacobian buffer: [X|Y|Z] (3*nl u64), canonical coords.
 * infinity <=> Z == 0. */

void zkt_g1_mul(const zkt_ctx *c, const u64 *xyz, const u64 *k, int kl, u64 *out) {
    g1 P, R;
    zkt_to_mont(c, P.X, xyz);
    zkt_to_mont(c, P.Y, xyz + c->nl);
    zkt_to_mont(c, P.Z, xyz + 2 * c->nl);
    g1_mul(c, &R, &P, k, kl);
    zkt_from_mont(c, out, R.X);
    zkt_from_mont(c, out + c->nl, R.Y);
    zkt_from_mont(c, out + 2 * c->nl, R.Z);
}

void zkt_g1_add(const zkt_ctx *c, const u64 *a, const u64 *b, u64 *out) {
    g1 P, Q, R;
    zkt_to_mont(c, P.X, a);
    zkt_to_mont(c, P.Y, a + c->nl);
    zkt_to_mont(c, P.Z, a + 2 * c->nl);
    zkt_to_mont(c, Q.X, b);
    zkt_to_mont(c, Q.Y, b + c->nl);
    zkt_to_mont(c, Q.Z, b + 2 * c->nl);
    g1_add(c, &R, &P, &Q);
    zkt_from_mont(c, out, R.X);
    zkt_from_mont(c, out + c->nl, R.Y);
    zkt_from_mont(c, out + 2 * c->nl, R.Z);
}

/* Jacobian -> affine; returns 0 if infinity (out untouched), 1 otherwise */
int zkt_g1_to_affine(const zkt_ctx *c, const u64 *xyz, u64 *out) {
    if (is_zero_n(xyz + 2 * c->nl, c->nl)) return 0;
    g1 P;
    zkt_to_mont(c, P.X, xyz);
    zkt_to_mont(c, P.Y, xyz + c->nl);
    zkt_to_mont(c, P.Z, xyz + 2 * c->nl);
    u64 zi[MAXL], zi2[MAXL], t[MAXL];
    finv(c, zi, P.Z);
    fsqr(c, zi2, zi);
    fmul(c, t, P.X, zi2);
    zkt_from_mont(c, out, t);
    fmul(c, t, P.Y, zi2);
    fmul(c, t, t, zi);
    zkt_from_mont(c, out + c->nl, t);
    return 1;
}

/* G2 Jacobian buffer: [X0|X1|Y0|Y1|Z0|Z1] (6*nl u64), canonical. */

static void g2_load(const zkt_ctx *c, g2 *P, const u64 *b) {
    zkt_to_mont(c, P->X.c0, b);
    zkt_to_mont(c, P->X.c1, b + c->nl);
    zkt_to_mont(c, P->Y.c0, b + 2 * c->nl);
    zkt_to_mont(c, P->Y.c1, b + 3 * c->nl);
    zkt_to_mont(c, P->Z.c0, b + 4 * c->nl);
    zkt_to_mont(c, P->Z.c1, b + 5 * c->nl);
}

static void g2_store(const zkt_ctx *c, const g2 *P, u64 *b) {
    zkt_from_mont(c, b, P->X.c0);
    zkt_from_mont(c, b + c->nl, P->X.c1);
    zkt_from_mont(c, b + 2 * c->nl, P->Y.c0);
    zkt_from_mont(c, b + 3 * c->nl, P->Y.c1);
    zkt_from_mont(c, b + 4 * c->nl, P->Z.c0);
    zkt_from_mont(c, b + 5 * c->nl, P->Z.c1);
}

void zkt_g2_mul(const zkt_ctx *c, const u64 *xyz, const u64 *k, int kl, u64 *out) {
    g2 P, R;
    g2_load(c, &P, xyz);
    g2_mul(c, &R, &P, k, kl);
    g2_store(c, &R, out);
}

void zkt_g2_add(const zkt_ctx *c, const u64 *a, const u64 *b, u64 *out) {
    g2 P, Q, R;
    g2_load(c, &P, a);
    g2_load(c, &Q, b);
    g2_add(c, &R, &P, &Q);
    g2_store(c, &R, out);
}

int zkt_g2_to_affine(const zkt_ctx *c, const u64 *xyz, u64 *out) {
    if (is_zero_n(xyz + 4 * c->nl, c->nl) && is_zero_n(xyz + 5 * c->nl, c->nl))
        return 0;
    g2 P;
    g2_load(c, &P, xyz);
    f2 zi, zi2, t;
    f2inv(c, &zi, &P.Z);
    f2sqr(c, &zi2, &zi);
    f2mul(c, &t, &P.X, &zi2);
    zkt_from_mont(c, out, t.c0);
    zkt_from_mont(c, out + c->nl, t.c1);
    f2mul(c, &zi2, &zi2, &zi);
    f2mul(c, &t, &P.Y, &zi2);
    zkt_from_mont(c, out + 2 * c->nl, t.c0);
    zkt_from_mont(c, out + 3 * c->nl, t.c1);
    return 1;
}
