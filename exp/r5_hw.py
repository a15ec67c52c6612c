"""Round-5 hardware shakedown: rebuild keys, compile + time the fused
single and batched proves with per-stage marks. Run AFTER the TPU tunnel
is back; doubles as the cache warmer for the driver's bench.py run."""

import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
os.environ["ZOKRATES_TPU_PROVE_TIMING"] = "1"
from zokrates_tpu.tpu_env import ensure_tpu_flags

ensure_tpu_flags()

import jax

from zokrates_tpu.fields.field import FIELDS
from zokrates_tpu.ir.r1cs import r1cs_from_prog
from zokrates_tpu.ir.serialize import deserialize
from zokrates_tpu.ir.witness import Witness
from zokrates_tpu.schemes import groth16 as G

ART = "/root/repo/bench_artifacts"
with open(f"{ART}/sha256.out", "rb") as f:
    prog = deserialize(f.read())
r1cs = r1cs_from_prog(prog)
B = int(os.environ.get("R5_B", "16"))
wits = []
for b in range(B):
    with open(f"{ART}/sha256.witness.b{b}", "rb") as f:
        wits.append(Witness.read(f, FIELDS["bn128"]))

import hashlib

import zokrates_tpu

pkg = os.path.dirname(zokrates_tpu.__file__)
h = hashlib.sha256()
for rel in (
    "schemes/groth16.py",
    "kernels/msm_sorted.py",
    "kernels/fixed_base.py",
    "kernels/pallas_field.py",
    "kernels/ntt.py",
    "fields/jfield.py",
):
    with open(os.path.join(pkg, rel), "rb") as f:
        h.update(f.read())
code_tag = h.hexdigest()
pk_cache = f"{ART}/sha256.g16.keys"

pk = vk = None
if os.path.exists(pk_cache):
    try:
        with open(pk_cache, "rb") as f:
            tag, pk, vk = pickle.load(f)
        if tag != code_tag:
            pk = vk = None
            print("key cache stale -> rebuild", flush=True)
    except Exception:
        pk = vk = None
if pk is None:
    t0 = time.time()
    pk, vk = G.setup(r1cs)
    print(f"setup: {time.time()-t0:.0f}s", flush=True)
    with open(pk_cache, "wb") as f:
        pickle.dump((code_tag, pk, vk), f)
print(f"h16: {None if pk.h16_p128 is None else pk.h16_p128.shape}", flush=True)

# batch first: it is bench.py's measured path — if the round runs out of
# TPU time, at least its compiles are cached
t0 = time.time()
proofs = G.prove_batch(r1cs, pk, wits)
print(f"batch B={B} compile: {time.time()-t0:.0f}s", flush=True)
for i, pr in enumerate(proofs):
    assert G.verify(vk, pr), f"batch proof {i} failed"
print(f"all {B} batch proofs verify", flush=True)
for i in range(3):
    t0 = time.time()
    proofs = G.prove_batch(r1cs, pk, wits)
    dt = time.time() - t0
    print(
        f"batch steady {i}: {dt*1e3:.0f} ms  ({dt/B*1e3:.0f} ms/proof, "
        f"{B/dt:.2f} proofs/s)",
        flush=True,
    )

if os.environ.get("R5_PROFILE") == "1":
    outdir = "/tmp/jaxprof"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        proofs = G.prove_batch(r1cs, pk, wits)
    print(f"profile captured to {outdir}", flush=True)

if os.environ.get("R5_SKIP_SINGLE") != "1":
    t0 = time.time()
    proof = G.prove(r1cs, pk, wits[0])
    print(f"single prove compile: {time.time()-t0:.0f}s", flush=True)
    assert G.verify(vk, proof), "single proof failed"
    for i in range(3):
        t0 = time.time()
        proof = G.prove(r1cs, pk, wits[0])
        print(f"single steady {i}: {(time.time()-t0)*1e3:.0f} ms", flush=True)
