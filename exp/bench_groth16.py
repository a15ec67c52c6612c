"""TPU benchmark: Groth16 prove throughput on real circuits.

Usage: python exp/bench_groth16.py [sha256|synth N]
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, "/root/repo")

import numpy as np


def sha256_circuit():
    from zokrates_tpu.lang.compile import compile_source

    src = """
import "hashes/sha256/sha256" as sha256;
def main(private u32[1][16] preimage) -> u32[8] {
    return sha256(preimage);
}
"""
    t0 = time.perf_counter()
    art = compile_source(src, curve="bn128")
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
    args = [[list(range(16))]]
    return art, args


def synth_circuit(n_constraints: int):
    """x_{i+1} = x_i^2 + i chain: n multiplicative constraints."""
    from zokrates_tpu.lang.compile import compile_source

    src = f"""
def main(private field x0) -> field {{
    field mut x = x0;
    for u32 i in 0..{n_constraints} {{
        x = x * x + 1;
    }}
    return x;
}}
"""
    t0 = time.perf_counter()
    art = compile_source(src, curve="bn128")
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
    return art, [3]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sha256"
    if which == "sha256":
        art, args = sha256_circuit()
    else:
        art, args = synth_circuit(int(sys.argv[2]))

    from zokrates_tpu.abi import encode_inputs
    from zokrates_tpu.fields.field import FIELDS
    from zokrates_tpu.interp.interpreter import Interpreter
    from zokrates_tpu.ir.r1cs import r1cs_from_prog
    from zokrates_tpu.schemes import groth16

    prog = art.prog
    ncons = sum(
        1 for s in prog.statements if type(s).__name__ == "Constraint"
    )
    print(f"constraints: {ncons}", flush=True)

    t0 = time.perf_counter()
    if which == "sha256":
        flat = encode_inputs(args, art.abi["inputs"], FIELDS["bn128"].P)
    else:
        flat = args
    w = Interpreter().execute(prog, flat)
    print(f"witness (scalar): {time.perf_counter()-t0:.1f}s", flush=True)

    r1cs = r1cs_from_prog(prog)
    t0 = time.perf_counter()
    pk, vk = groth16.setup(r1cs)
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    proof = groth16.prove(r1cs, pk, w)
    print(f"prove (first, incl compile): {time.perf_counter()-t0:.1f}s", flush=True)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        proof = groth16.prove(r1cs, pk, w)
    dt = (time.perf_counter() - t0) / iters
    print(f"prove steady: {dt*1e3:.0f} ms -> {1/dt:.2f} proofs/s", flush=True)

    t0 = time.perf_counter()
    ok = groth16.verify(vk, proof)
    print(f"verify: {ok} ({time.perf_counter()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
