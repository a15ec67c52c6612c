"""Truncated full-pipeline timings: where does _msm_device spend time?"""
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

lg = int(sys.argv[1]) if len(sys.argv) > 1 else 18
N = 1 << lg
grp = g1_group("bn128")
p, r_mod = grp.q, grp.r
nl = field_spec(p).nl
cfg = M.default_config(N)
W = M._windows(r_mod, cfg.c)
sh = M._plan_shapes(N, W, cfg)

rng = np.random.RandomState(3)
P128 = jnp.asarray(rng.randint(0, 1 << 16, (N, 128)).astype(np.uint32))
scal = [int.from_bytes(rng.bytes(32), "big") % r_mod for _ in range(N)]
S = jnp.asarray(ints_to_limbs(scal, n_limbs(r_mod)))


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        jax.device_get(leaves[-1])


def bench(name, fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
        _sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:.2f} ms", flush=True)
    return out


hb, K1, cap1, cap2 = sh["hb"], sh["K1"], sh["cap1"], sh["cap2"]
M1, R, lw2 = cfg.M1, cfg.R, cfg.lw2
M4, L4 = sh["M4"], sh["L4"]


def device_until(stage):
    def fn(P128, scalars):
        buckets, signs = M._signed_digits(scalars, W, cfg.c)
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None], (W, N))
        payload = idx | (signs << np.uint32(31))
        sb, sidx = jax.lax.sort((buckets, payload), dimension=1, num_keys=1)
        flags2d, valid = M._walk_flags(sb, K1)
        gpos = M._compact_positions(valid, cap1)
        if stage == "A":
            return sb, sidx, gpos
        vtaken = jnp.take_along_axis(valid, gpos, axis=1)
        rec_buck = jnp.where(vtaken, jnp.take_along_axis(sb, gpos, axis=1), 0)
        l1 = M._walk_call(p, R, M1, K1 // R, "mixed", False, cfg.interpret)
        rec_list = []
        coll_any = jnp.zeros((), jnp.uint32)
        for w in range(W):
            pidx = (sidx[w] & np.uint32(0x7FFFFFFF)).astype(jnp.int32)
            sign = sidx[w] >> np.uint32(31)
            rows = jnp.take(P128, pidx, axis=0)
            x = rows[:, :nl]
            y = rows[:, nl : 2 * nl]
            ny = rows[:, 2 * nl : 3 * nl]
            ysel = jnp.where((sign == 1)[:, None], ny, y)
            walk_in = M._to_walk(jnp.concatenate([x, ysel], axis=1), M1, K1)
            flags_walk = M._flags_to_walk(flags2d[w], M1, K1, R)
            O1, coll = l1(walk_in, flags_walk)
            coll_any = jnp.maximum(coll_any, jnp.max(coll))
            if stage == "walks":
                rec_list.append(O1[0, 0])
                continue
            O1T = M._from_walk(O1)
            rrows = (gpos[w] % K1) * M1 + gpos[w] // K1
            rec_list.append(jnp.take(O1T, rrows, axis=0))
        if stage == "walks":
            return rec_list, coll_any
        recs = jnp.concatenate(rec_list, axis=0)
        if stage == "extract":
            return recs, coll_any
        recs, rbuck = M._merge_level(
            p, recs, rec_buck.reshape(-1), W, cap1, cap2, lw2, R, cfg.interpret
        )
        if stage == "merge1":
            return recs, rbuck, coll_any
        recs, rbuck = M._merge_level(p, recs, rbuck, W, cap2, cap2, lw2, R, cfg.interpret)
        if stage == "merge2":
            return recs, rbuck, coll_any
        rb_w = rbuck.reshape(W, cap2)
        prev = jnp.concatenate([jnp.zeros((W, 1), jnp.uint32), rb_w[:, :-1]], axis=1)
        slot = jnp.logical_and(rb_w == prev, rb_w != 0).astype(jnp.int32)
        wi = jnp.arange(W, dtype=jnp.int32)[:, None]
        j = jnp.arange(cap2, dtype=jnp.int32)[None, :]
        dense_pos = slot * (W * hb) + wi * hb + (hb - rb_w.astype(jnp.int32))
        dump_pos = 2 * W * hb + wi * cap2 + j
        pos = jnp.where(rb_w != 0, dense_pos, dump_pos).reshape(-1)
        table = jnp.zeros((2 * W * hb + W * cap2, 3 * nl), jnp.uint32)
        table = table.at[pos].set(recs, unique_indices=True)
        A = M._to_walk(table[: W * hb], M4, L4)
        B = M._to_walk(table[W * hb : 2 * W * hb], M4, L4)
        sfx = M._suffix_call(p, L4, lw2, M4, cfg.interpret)
        out6 = sfx(A, B)
        if stage == "suffix":
            return out6, coll_any
        wX, wY, wZ = M._suffix_post(p, W, lw2, L4, out6)
        return (wX, wY, wZ), coll_any

    return jax.jit(fn)


for st in ["A", "walks", "extract", "merge1", "merge2", "suffix", "full"]:
    bench(f"through-{st}", device_until(st), P128, S)
