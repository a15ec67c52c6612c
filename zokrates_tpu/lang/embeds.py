"""Compiler-intrinsic gadgets beyond bit casts.

sha256round: the SHA-256 compression function as a flattener-level gadget
(the reference splices a constraint table extracted from bellman's sha256
gadget, zokrates_embed/src/bellman.rs:16-319; we generate the circuit
directly from the FIPS 180-3 round structure using the same per-bit
ch/maj/xor gadget costs, which lands in the same constraint ballpark).

Interface (embed.rs:264-269): (bool[512] input, bool[256] current_hash)
-> bool[256].
"""

from typing import List

from .flatten import ArrayVal, BoolVal, UintVal
from .types import BOOL

K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]


def snark_verify_embed(ev, args, span):
    """Splice the snark_verify_bls12_377 gadget (embed/snark_verify.py)
    into the circuit, mirroring the reference splice
    (zokrates_ast/src/common/embed.rs:433): one directive solving ALL
    gadget variables, a one-binding, input bindings, and the constraint
    table over freshly allocated circuit wires."""
    from ..embed.snark_verify import generate_verify_constraints
    from ..ir.program import LinComb, QuadComb, Solver
    from .evaluator import CompileError
    from .flatten import FieldVal

    flat = ev.flat
    if ev.curve != "bw6_761":
        raise CompileError(
            f"snark_verify_bls12_377 is only available on bw6_761 (got {ev.curve})",
            span,
        )
    if len(args) != 3:
        raise CompileError("snark_verify_bls12_377 expects (inputs, proof, vk)", span)
    inputs, proof, vk = args
    for arr, want, label in (
        (inputs, None, "inputs"),
        (proof, 8, "proof"),
        (vk, None, "vk"),
    ):
        if not isinstance(arr, ArrayVal):
            raise CompileError(f"snark_verify {label} must be a field array", span)
    n = len(inputs.items)
    if len(proof.items) != 8:
        raise CompileError("snark_verify proof must be field[8]", span)
    if len(vk.items) != 18 + 2 * n:
        raise CompileError(
            f"snark_verify vk must be field[{18 + 2 * n}] for {n} inputs", span
        )

    out_idx, iidx, pidx, vidx, cons, nvars = generate_verify_constraints(n)

    cvars = [flat.new_var() for _ in range(nvars)]

    def as_field(v):
        return v if isinstance(v, FieldVal) else FieldVal(v.lin)

    arg_lins = [as_field(v).lin for v in inputs.items + proof.items + vk.items]
    flat.directive(arg_lins, cvars, Solver("SnarkVerifyBls12377", n))

    # gadget-local one == 1
    flat.constraint(
        QuadComb(LinComb.one(), LinComb.from_var(cvars[0])), LinComb.constant(1)
    )
    for gidx, arglin in zip(iidx + pidx + vidx, arg_lins):
        flat.constraint(
            QuadComb(LinComb.one(), LinComb.from_var(cvars[gidx])), arglin
        )

    def lin_of(d):
        return LinComb([(cvars[v], c) for v, c in d.items()])

    for a, b, c in cons:
        flat.constraint(QuadComb(lin_of(a), lin_of(b)), lin_of(c))

    return BoolVal(LinComb.from_var(cvars[out_idx]))


def sha256_round_embed(ev, args, span):
    from .evaluator import CompileError

    flat = ev.flat
    if len(args) != 2:
        raise CompileError("sha256round expects (bool[512], bool[256])", span)
    inp, cur = args
    if not (isinstance(inp, ArrayVal) and inp.ty.length == 512):
        raise CompileError(f"sha256round input must be bool[512], got {inp.ty}", span)
    if not (isinstance(cur, ArrayVal) and cur.ty.length == 256):
        raise CompileError(f"sha256round hash must be bool[256], got {cur.ty}", span)

    def word(bits: List[BoolVal]) -> UintVal:
        return flat.u_from_bits(list(bits), 32)

    w = [word(inp.items[i * 32 : (i + 1) * 32]) for i in range(16)]
    hs = [word(cur.items[i * 32 : (i + 1) * 32]) for i in range(8)]

    def rotr(x: UintVal, n: int) -> UintVal:
        bits = flat.u_bits(x)
        return flat.u_from_bits(bits[32 - n :] + bits[: 32 - n], 32)

    def shr(x: UintVal, n: int) -> UintVal:
        return flat.u_shift(x, n, left=False)

    def xor3(a, b, c):
        return flat.u_bitwise(flat.u_bitwise(a, b, "xor"), c, "xor")

    # message schedule
    for i in range(16, 64):
        s0 = xor3(rotr(w[i - 15], 7), rotr(w[i - 15], 18), shr(w[i - 15], 3))
        s1 = xor3(rotr(w[i - 2], 17), rotr(w[i - 2], 19), shr(w[i - 2], 10))
        w.append(
            flat.u_reduce(
                flat.u_add(flat.u_add(w[i - 16], s0), flat.u_add(w[i - 7], s1))
            )
        )

    a, b, c, d, e, f, g, h = hs
    for i in range(64):
        S1 = xor3(rotr(e, 6), rotr(e, 11), rotr(e, 25))
        ch = ev._sha_ch(flat.u_reduce(e), flat.u_reduce(f), flat.u_reduce(g))
        t1 = flat.u_add(
            flat.u_add(flat.u_add(h, S1), flat.u_add(ch, flat.u_const(K[i], 32))),
            w[i],
        )
        S0 = xor3(rotr(a, 2), rotr(a, 13), rotr(a, 22))
        maj = ev._sha_maj(flat.u_reduce(a), flat.u_reduce(b), flat.u_reduce(c))
        t2 = flat.u_add(S0, maj)
        h = g
        g = f
        f = e
        e = flat.u_reduce(flat.u_add(d, t1))
        d = c
        c = b
        b = a
        a = flat.u_reduce(flat.u_add(t1, t2))

    out_words = [
        flat.u_reduce(flat.u_add(x, y))
        for x, y in zip(hs, [a, b, c, d, e, f, g, h])
    ]
    out_bits: List[BoolVal] = []
    for wd in out_words:
        out_bits += flat.u_bits(wd)
    return ArrayVal(BOOL, out_bits)
