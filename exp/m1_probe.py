"""Probe TPU primitive costs for the sort-based MSM design.

Measures:
  1. Pallas Montgomery mul marginal cost at (nl=16, lanes) for lanes in {512, 1024}
  2. jax.lax.sort of (W, N) uint32 keys + uint32 payload
  3. gather of (N, 32) uint32 point rows by permutation
  4. cumsum over (W, N) uint32
"""
import time, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from zokrates_tpu.kernels.pallas_field import _F
from zokrates_tpu.fields.params import BASE_FIELDS

p = BASE_FIELDS["bn128"].p
F = _F(p)
nl = F.nl
print("nl =", nl, "device:", jax.devices())

def timeit(fn, *args, n=5, warm=2):
    for _ in range(warm):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

# --- 1. mul chain kernel: T sequential muls on (nl, lanes) ---
def mul_chain_kernel_factory(T, lanes):
    def kernel(a_ref, b_ref, o_ref):
        F.prep(lanes)
        a = [a_ref[i:i+1] for i in range(nl)]
        b = [b_ref[i:i+1] for i in range(nl)]
        for _ in range(T):
            a = F.mul(a, b)
        o_ref[:] = jnp.concatenate(a, axis=0)
    return kernel

for lanes in (512, 1024):
    for T in (8, 64):
        k = pl.pallas_call(
            mul_chain_kernel_factory(T, lanes),
            out_shape=jax.ShapeDtypeStruct((nl, lanes), jnp.uint32),
        )
        kj = jax.jit(k)
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
        dt = timeit(kj, a, b, n=20)
        print(f"mul chain lanes={lanes} T={T}: {dt*1e6:.1f}us total")

# marginal: (T=64 - T=8) / 56
for lanes in (512, 1024):
    ts = {}
    for T in (8, 64):
        k = jax.jit(pl.pallas_call(
            mul_chain_kernel_factory(T, lanes),
            out_shape=jax.ShapeDtypeStruct((nl, lanes), jnp.uint32),
        ))
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
        ts[T] = timeit(k, a, b, n=50)
    marg = (ts[64] - ts[8]) / 56
    print(f"lanes={lanes}: marginal mul = {marg*1e9:.0f}ns -> {lanes/marg/1e9:.2f}G lane-muls/s")

# --- 2. sort ---
for W, N in ((16, 1 << 20), (16, 1 << 18)):
    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.integers(0, 1 << 15, (W, N), dtype=np.uint32))
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None], (W, N))
    f = jax.jit(lambda k, i: jax.lax.sort((k, i), dimension=1, is_stable=False, num_keys=1))
    dt = timeit(f, keys, idx, n=3)
    print(f"lax.sort (W={W}, N=2^{int(np.log2(N))}) keys+payload: {dt*1e3:.1f}ms")

# --- 3. gather point rows ---
N = 1 << 20
rng = np.random.default_rng(2)
pts = jnp.asarray(rng.integers(0, 1 << 16, (N, 32), dtype=np.uint32))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
g = jax.jit(lambda p_, i_: jnp.take(p_, i_, axis=0))
dt = timeit(g, pts, perm, n=5)
print(f"gather (2^20, 32)u32 rows: {dt*1e3:.2f}ms ({N*32*4*2/dt/1e9:.0f} GB/s)")

# gather with W=16 windows
permW = jnp.asarray(np.stack([rng.permutation(N) for _ in range(4)]).astype(np.int32))
gW = jax.jit(lambda p_, i_: jnp.take(p_, i_.reshape(-1), axis=0).reshape(4, N, 32))
dt = timeit(gW, pts, permW, n=3)
print(f"gather x4 windows: {dt*1e3:.2f}ms")

# --- 4. cumsum ---
x = jnp.asarray(rng.integers(0, 2, (16, 1 << 20), dtype=np.uint32))
c = jax.jit(lambda v: jnp.cumsum(v, axis=1))
dt = timeit(c, x, n=5)
print(f"cumsum (16, 2^20): {dt*1e3:.2f}ms")
