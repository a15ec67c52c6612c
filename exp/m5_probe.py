import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
rng = np.random.default_rng(1)

def timeit(fn, *args, n=3, warm=1):
    for _ in range(warm):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / n

for N in (1 << 18, 1 << 20):
    keys = jnp.asarray(rng.integers(0, 1 << 15, (16, N), dtype=np.uint32))
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None], (16, N))
    f = jax.jit(lambda k, i: jax.lax.sort((k, i), dimension=1, is_stable=False, num_keys=1))
    print(f"lax.sort (16, 2^{int(np.log2(N))}): {timeit(f, keys, idx)*1e3:.2f}ms")

N = 1 << 20
pts = jnp.asarray(rng.integers(0, 1 << 16, (N, 32), dtype=np.uint32))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
g = jax.jit(lambda p_, i_: jnp.take(p_, i_, axis=0))
dt = timeit(g, pts, perm, n=3)
print(f"gather (2^20,32): {dt*1e3:.2f}ms ({N*32*4*2/dt/1e9:.0f} GB/s)")

x = jnp.asarray(rng.integers(0, 2, (16, 1 << 20), dtype=np.uint32))
c = jax.jit(lambda v: jnp.cumsum(v, axis=1))
print(f"cumsum (16,2^20): {timeit(c, x, n=3)*1e3:.2f}ms")

# scatter 32k rows of 96 u32 to dense table
T = 1 << 15
recs = jnp.asarray(rng.integers(0, 1 << 16, (T, 96), dtype=np.uint32))
ids = jnp.asarray(np.sort(rng.choice(T, T, replace=False)).astype(np.int32))
s = jax.jit(lambda r_, i_: jnp.zeros((T, 96), jnp.uint32).at[i_].set(r_, unique_indices=True))
print(f"scatter 32k x 96: {timeit(s, recs, ids, n=3)*1e3:.2f}ms")
