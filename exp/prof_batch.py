"""Capture a device profile of one steady batched prove and print the
top XLA/Mosaic ops by device time (parses the xplane proto via
tensorboard_plugin_profile). Run after exp/r5_hw.py so compiles are cached."""

import glob
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
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
wits = []
for b in range(8):
    with open(f"{ART}/sha256.witness.b{b}", "rb") as f:
        wits.append(Witness.read(f, FIELDS["bn128"]))
with open(f"{ART}/sha256.g16.keys", "rb") as f:
    _tag, pk, vk = pickle.load(f)

# warm (compile-cached)
proofs = G.prove_batch(r1cs, pk, wits)
assert G.verify(vk, proofs[0])

outdir = "/tmp/jaxprof"
os.system(f"rm -rf {outdir}")
t0 = time.time()
with jax.profiler.trace(outdir):
    proofs = G.prove_batch(r1cs, pk, wits)
print(f"profiled prove_batch: {time.time()-t0:.2f}s", flush=True)

# parse xplane
from tensorboard_plugin_profile.protobuf import xplane_pb2

paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths)
for path in paths:
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        evs = {}
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ms
                evs[name] = evs.get(name, 0.0) + dur
        total = sum(evs.values())
        print(f"\n== plane {plane.name}: total {total:.1f} ms over {len(evs)} op names")
        for name, ms in sorted(evs.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {ms:9.2f} ms  {name[:110]}")
