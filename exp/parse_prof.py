"""Parse a jax.profiler perfetto trace (vm.trace.json.gz) and print the
root-level device-op time breakdown with source attribution.

Usage: python exp/parse_prof.py [/tmp/jaxprof]
"""

import collections
import glob
import gzip
import json
import sys

base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
paths = sorted(glob.glob(f"{base}/**/*.trace.json.gz", recursive=True))
assert paths, f"no trace under {base}"
with gzip.open(paths[-1]) as f:
    tr = json.load(f)
evs = tr["traceEvents"]
pids = {
    e["pid"]: e["args"]["name"]
    for e in evs
    if e.get("ph") == "M" and e.get("name") == "process_name"
}
tids = {
    (e["pid"], e["tid"]): e["args"]["name"]
    for e in evs
    if e.get("ph") == "M" and e.get("name") == "thread_name"
}
tpu_pid = [p for p, n in pids.items() if "TPU" in n][0]
X = [
    e
    for e in evs
    if e.get("ph") == "X"
    and e["pid"] == tpu_pid
    and tids.get((e["pid"], e["tid"])) == "XLA Ops"
]
X.sort(key=lambda e: (e["ts"], -e["dur"]))
stack, roots = [], []
for e in X:
    while stack and e["ts"] >= stack[-1]["ts"] + stack[-1]["dur"]:
        stack.pop()
    if not stack:
        roots.append(e)
    stack.append(e)
agg = collections.defaultdict(lambda: [0.0, 0, ""])
for r in roots:
    src = r.get("args", {}).get("source", "")
    a = agg[r["name"]]
    a[0] += r["dur"] / 1e3
    a[1] += 1
    a[2] = src
tot = sum(v[0] for v in agg.values())
print(f"root total {tot:.1f} ms over {len(roots)} root events")
for name, (ms, n, src) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
    print(f"{ms:9.2f} ms x{n:<4} {name[:40]:<42} {src}")
