"""Calibration experiments on the real TPU for MSM redesign.

Measures: XLA sort, row gather, pallas field-mul throughput, segment_sum.
"""
import time, functools
import jax, jax.numpy as jnp
import numpy as np

def _sync(out):
    leaves = jax.tree.leaves(out)
    for l in leaves:
        jax.device_get(l.ravel()[:1])

def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / n

rng = np.random.default_rng(0)

# 1. sort: batched rows (16, N) uint32
for logn in (18, 20):
    N = 1 << logn
    keys = jnp.asarray(rng.integers(0, 1 << 15, size=(16, N), dtype=np.uint32))
    vals = jnp.asarray(np.tile(np.arange(N, dtype=np.uint32), (16, 1)))
    f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1, dimension=1))
    t = timeit(f, keys, vals)
    print(f"sort16x2^{logn}: {t*1e3:.2f} ms  ({16*N/t/1e6:.1f} M elt/s)")

# argsort single
for logn in (20,):
    N = 1 << logn
    keys = jnp.asarray(rng.integers(0, 1 << 15, size=(N,), dtype=np.uint32))
    f = jax.jit(jnp.argsort)
    t = timeit(f, keys)
    print(f"argsort 2^{logn}: {t*1e3:.2f} ms")

# 2. gather rows (N, 32) uint32 by random perm
for logn in (20,):
    N = 1 << logn
    pts = jnp.asarray(rng.integers(0, 2**32, size=(N, 32), dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(N).astype(np.int32))
    f = jax.jit(lambda p, i: jnp.take(p, i, axis=0))
    t = timeit(f, pts, idx)
    print(f"gather (2^{logn},32)u32 rows: {t*1e3:.2f} ms ({N*128/t/1e9:.1f} GB/s)")
    # 16 gathers (all windows)
    idx16 = jnp.asarray(np.stack([rng.permutation(N) for _ in range(16)]).astype(np.int32))
    f2 = jax.jit(lambda p, i: jnp.take(p, i.reshape(-1), axis=0))
    t = timeit(f2, pts, idx16)
    print(f"gather 16x: {t*1e3:.2f} ms ({16*N*128/t/1e9:.1f} GB/s)")

# 3. pallas field mul throughput
import sys
sys.path.insert(0, "/root/repo")
from zokrates_tpu.fields.params import BN254_Q
from zokrates_tpu.kernels.pallas_field import _F, _split, _join
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

p = BN254_Q
F = _F(p)
nl = F.nl
print("nl =", nl)

def mulk_factory(reps):
    def kernel(a_ref, b_ref, o_ref):
        F.prep(a_ref.shape[1])
        a = _split(a_ref[:], nl)
        b = _split(b_ref[:], nl)
        for _ in range(reps):
            a = F.mul(a, b)
        o_ref[:] = _join(a)
    return kernel

for lanes, reps in ((512, 16), (1024, 16), (2048, 16), (4096, 8)):
    kern = mulk_factory(reps)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(nl, lanes), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(nl, lanes), dtype=np.uint32))
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nl, lanes), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(call)
    t = timeit(f, a, b)
    print(f"mont_mul lanes={lanes} reps={reps}: {t*1e6:.1f} us -> {lanes*reps/t/1e6:.1f} M muls/s")

# grid version, bigger N: (nl, N) blocks of 1024 lanes, reps muls each
for Nl, blk, reps in ((1 << 16, 1024, 16),):
    kern = mulk_factory(reps)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(nl, Nl), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(nl, Nl), dtype=np.uint32))
    spec = pl.BlockSpec((nl, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((nl, Nl), jnp.uint32),
        grid=(Nl // blk,), in_specs=[spec] * 2, out_specs=spec,
    )
    f = jax.jit(call)
    t = timeit(f, a, b)
    print(f"mont_mul grid N={Nl} blk={blk} reps={reps}: {t*1e3:.2f} ms -> {Nl*reps/t/1e6:.1f} M muls/s")

# 4. segment_sum of (N,) int32 -> 2^15 segs
N = 1 << 20
data = jnp.asarray(rng.integers(0, 1 << 15, size=(N,), dtype=np.int32))
seg = jnp.asarray(np.sort(rng.integers(0, 1 << 15, size=(N,))).astype(np.int32))
f = jax.jit(functools.partial(jax.ops.segment_sum, num_segments=1 << 15))
t = timeit(f, data, seg)
print(f"segment_sum 2^20 -> 2^15: {t*1e3:.2f} ms")

# 5. cumsum
f = jax.jit(lambda x: jnp.cumsum(x))
t = timeit(f, data)
print(f"cumsum 2^20: {t*1e3:.2f} ms")
