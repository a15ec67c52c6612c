"""Round-5 ground truth: fused prove stage timings on TPU."""
import os, pickle, sys, time
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
with open(f"{ART}/sha256.witness", "rb") as f:
    witness = Witness.read(f, FIELDS["bn128"])
r1cs = r1cs_from_prog(prog)
with open(f"{ART}/sha256.g16.keys", "rb") as f:
    obj = pickle.load(f)
pk, vk = (obj[1], obj[2]) if len(obj) == 3 else obj

t0 = time.time()
proof = G.prove(r1cs, pk, witness)
print(f"warm prove: {time.time()-t0:.1f}s", flush=True)
for i in range(3):
    print(f"--- steady iter {i} ---", flush=True)
    t0 = time.time()
    proof = G.prove(r1cs, pk, witness)
    print(f"steady prove: {(time.time()-t0)*1e3:.0f} ms", flush=True)
