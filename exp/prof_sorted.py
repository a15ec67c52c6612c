"""Stage-by-stage timing of the sorted MSM at a given size on TPU."""
import os, sys, time, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, "/root/repo")
from zokrates_tpu.tpu_env import ensure_tpu_flags
ensure_tpu_flags()

import jax
import jax.numpy as jnp
import numpy as np

from zokrates_tpu.ec.curve import g1_group
from zokrates_tpu.fields.jfield import field_spec
from zokrates_tpu.fields.limbs import ints_to_limbs, n_limbs
from zokrates_tpu.kernels import msm_sorted as M

lg = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << lg
grp = g1_group("bn128")
p, r_mod = grp.q, grp.r
nl = field_spec(p).nl
cfg = M.default_config(N)
W = M._windows(r_mod, cfg.c)
sh = M._plan_shapes(N, W, cfg)
print("cfg", cfg, "W", W, "shapes", sh, flush=True)

rng = np.random.RandomState(3)
P128 = jnp.asarray(rng.randint(0, 1 << 16, (N, 128)).astype(np.uint32))
scal = [int.from_bytes(rng.bytes(32), "big") % r_mod for _ in range(N)]
S = jnp.asarray(ints_to_limbs(scal, n_limbs(r_mod)))

def _sync(out):
    # block_until_ready does not actually block on the axon tunnel
    # backend; force a real device->host read of one leaf instead.
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        jax.device_get(leaves[-1])


def bench(name, fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
        _sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)
    return out

hb, K1, cap1 = sh["hb"], sh["K1"], sh["cap1"]
M1, R, lw2 = cfg.M1, cfg.R, cfg.lw2

@jax.jit
def stageA(scalars):
    buckets, signs = M._signed_digits(scalars, W, cfg.c)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None], (W, N))
    payload = idx | (signs << np.uint32(31))
    sb, sidx = jax.lax.sort((buckets, payload), dimension=1, num_keys=1)
    flags2d, valid = M._walk_flags(sb, K1)
    gpos = M._compact_positions(valid, cap1)
    return sb, sidx, flags2d, gpos

sb, sidx, flags2d, gpos = bench("A digits+sort+flags+compact", stageA, S)

@jax.jit
def stageB_prep(P128, sidx, flags2d):
    outs = []
    for w in range(W):
        pidx = (sidx[w] & np.uint32(0x7FFFFFFF)).astype(jnp.int32)
        sign = sidx[w] >> np.uint32(31)
        rows = jnp.take(P128, pidx, axis=0)
        x = rows[:, :nl]
        y = rows[:, nl : 2 * nl]
        ny = rows[:, 2 * nl : 3 * nl]
        ysel = jnp.where((sign == 1)[:, None], ny, y)
        walk_in = M._to_walk(jnp.concatenate([x, ysel], axis=1), M1, K1)
        fw = M._flags_to_walk(flags2d[w], M1, K1, R)
        outs.append((walk_in, fw))
    return outs

prep = bench("B gather+layout (all W)", stageB_prep, P128, sidx, flags2d)

l1 = M._walk_call(p, R, M1, K1 // R, "mixed", False, False)
def stageB_walks(prep):
    res = [l1(wi, fw) for wi, fw in prep]
    return res
walks = bench("B walks (all W)", stageB_walks, prep)

@jax.jit
def stageB_extract(walk_outs, gpos):
    recs = []
    for w in range(W):
        O1T = M._from_walk(walk_outs[w][0])
        rrows = (gpos[w] % K1) * M1 + gpos[w] // K1
        recs.append(jnp.take(O1T, rrows, axis=0))
    return jnp.concatenate(recs, axis=0)

recs = bench("B extract records", stageB_extract, walks, gpos)

# full device pipeline for reference
full = M._msm_jit(p, W, N, cfg, False, None, M._fold_override(cfg))
out = bench("FULL pipeline", full, P128, S)
