"""Benchmark: Groth16 prove throughput on the compiled SHA-256 circuit, TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured quantity is the BASELINE.md target metric: end-to-end Groth16
proofs/second on the compiled sha256 stdlib circuit (~27k constraints,
2^15 QAP domain) — witness already computed (compute-witness is a separate
CLI stage in the reference too), so a proof = 3 sparse matvecs + the
coset-NTT h-pipeline + 4 G1 MSMs + 1 G2 MSM, all on device
(schemes/groth16.py), with full-width random prover scalars.

The circuit is loaded from bench_artifacts/sha256.out (compiled once by
zokrates_tpu.lang from zokrates_stdlib sources) so the bench measures the
prover, not the Python frontend. Setup (device fixed-base MSMs) and the
first-prove Mosaic/XLA compiles are excluded as warmup; steady state is
averaged over 3 proves.

vs_baseline anchors against 20 proofs/s — an order-of-magnitude figure for
arkworks' rayon-parallel bn254 Groth16 at this size on a modern 16-core
host (the reference publishes no numbers, BASELINE.md: 4-5 MSMs of ~27k
points at ~5M points/s plus 7 NTTs of 2^15 ≈ 50 ms/proof).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

from zokrates_tpu.tpu_env import ensure_tpu_flags

ensure_tpu_flags()

BASELINE_PROOFS_PER_S = 20.0
ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_artifacts")


def main():
    from zokrates_tpu.fields.field import FIELDS
    from zokrates_tpu.ir.r1cs import r1cs_from_prog
    from zokrates_tpu.ir.serialize import deserialize
    from zokrates_tpu.ir.witness import Witness
    from zokrates_tpu.schemes import groth16

    with open(os.path.join(ART, "sha256.out"), "rb") as f:
        prog = deserialize(f.read())
    with open(os.path.join(ART, "sha256.witness"), "rb") as f:
        witness = Witness.read(f, FIELDS["bn128"])
    r1cs = r1cs_from_prog(prog)
    print(
        f"sha256 circuit: {r1cs.num_constraints} constraints, "
        f"{r1cs.num_variables} variables",
        file=sys.stderr,
    )

    t0 = time.perf_counter()
    import pickle

    pk_cache = os.path.join(ART, "sha256.g16.keys")  # gitignored, rebuilt if absent
    if os.path.exists(pk_cache):
        with open(pk_cache, "rb") as f:
            pk, vk = pickle.load(f)
        print(f"setup (cached): {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    else:
        pk, vk = groth16.setup(r1cs)
        with open(pk_cache, "wb") as f:
            pickle.dump((pk, vk), f)
        print(f"setup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    proof = groth16.prove(r1cs, pk, witness)
    print(f"prove (compile): {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        proof = groth16.prove(r1cs, pk, witness)
    dt = (time.perf_counter() - t0) / iters
    print(f"prove steady: {dt * 1e3:.0f} ms", file=sys.stderr)

    assert groth16.verify(vk, proof), "proof failed to verify"

    proofs_per_s = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "groth16_prove_sha256_27k",
                "value": round(proofs_per_s, 3),
                "unit": "proofs/s",
                "vs_baseline": round(proofs_per_s / BASELINE_PROOFS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
