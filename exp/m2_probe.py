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

def timeit(fn, *args, n=5, warm=1):
    for _ in range(warm):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])  # force sync read
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / n

def mul_chain_kernel_factory(T, lanes):
    def kernel(a_ref, b_ref, o_ref):
        F.prep(lanes)
        a = [a_ref[i:i+1] for i in range(nl)]
        b = [b_ref[i:i+1] for i in range(nl)]
        for _ in range(T):
            a = F.mul(a, b)
        o_ref[:] = jnp.concatenate(a, axis=0)
    return kernel

rng = np.random.default_rng(0)
for lanes in (512, 1024, 2048):
    ts = {}
    for T in (64, 320):
        k = jax.jit(pl.pallas_call(
            mul_chain_kernel_factory(T, lanes),
            out_shape=jax.ShapeDtypeStruct((nl, lanes), jnp.uint32),
        ))
        a = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
        ts[T] = timeit(k, a, b, n=30)
    marg = (ts[320] - ts[64]) / 256
    print(f"lanes={lanes}: T64={ts[64]*1e6:.0f}us T320={ts[320]*1e6:.0f}us marginal={marg*1e9:.1f}ns -> {lanes/marg/1e9:.2f}G lane-muls/s")

# sort with real sync
for N in (1 << 18, 1 << 20):
    keys = jnp.asarray(rng.integers(0, 1 << 15, (16, N), dtype=np.uint32))
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None], (16, N))
    f = jax.jit(lambda k, i: jax.lax.sort((k, i), dimension=1, is_stable=False, num_keys=1))
    dt = timeit(f, keys, idx, n=3)
    print(f"lax.sort (16, 2^{int(np.log2(N))}): {dt*1e3:.2f}ms")

# argsort alternative
f2 = jax.jit(lambda k: jnp.argsort(k, axis=1))
keys = jnp.asarray(rng.integers(0, 1 << 15, (16, 1 << 20), dtype=np.uint32))
dt = timeit(f2, keys, n=3)
print(f"argsort (16, 2^20): {dt*1e3:.2f}ms")

# gather
N = 1 << 20
pts = jnp.asarray(rng.integers(0, 1 << 16, (N, 32), dtype=np.uint32))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
g = jax.jit(lambda p_, i_: jnp.take(p_, i_, axis=0))
dt = timeit(g, pts, perm, n=5)
print(f"gather (2^20,32): {dt*1e3:.2f}ms ({N*32*4*2/dt/1e9:.0f} GB/s)")

x = jnp.asarray(rng.integers(0, 2, (16, 1 << 20), dtype=np.uint32))
c = jax.jit(lambda v: jnp.cumsum(v, axis=1))
dt = timeit(c, x, n=5)
print(f"cumsum (16,2^20): {dt*1e3:.2f}ms")

# grid-step overhead: same mul work split over grid steps, VMEM scratch carry
def grid_kernel_factory(T, lanes, G):
    def kernel(a_ref, b_ref, o_ref, acc):
        F.prep(lanes)
        t = pl.program_id(0)
        @pl.when(t == 0)
        def _():
            acc[...] = a_ref[...]
        a = [acc[i:i+1] for i in range(nl)]
        b = [b_ref[i:i+1] for i in range(nl)]
        for _ in range(T):
            a = F.mul(a, b)
        acc[...] = jnp.concatenate(a, axis=0)
        @pl.when(t == G - 1)
        def _():
            o_ref[...] = acc[...]
    return kernel

lanes = 1024
for (T, G) in ((8, 64), (32, 16), (4, 128)):
    k = jax.jit(pl.pallas_call(
        grid_kernel_factory(T, lanes, G),
        grid=(G,),
        in_specs=[pl.BlockSpec((nl, lanes), lambda t: (0, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((nl, lanes), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nl, lanes), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((nl, lanes), jnp.uint32)],
    ))
    a = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
    dt = timeit(k, a, b, n=20)
    print(f"grid G={G} T={T} (512 muls total): {dt*1e6:.0f}us -> per-step overhead vs monolith")
