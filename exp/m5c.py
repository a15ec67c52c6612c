import time, sys
import numpy as np
import jax, jax.numpy as jnp
rng = np.random.default_rng(1)
def timeit(fn, *args, n=5, warm=1):
    t0=time.perf_counter()
    for _ in range(warm):
        r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    print(f"  (compile+first: {time.perf_counter()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / n

which = sys.argv[1]
if which == "sort":
    for N in (1 << 18, 1 << 20):
        keys = jnp.asarray(rng.integers(0, 1 << 15, (16, N), dtype=np.uint32))
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None], (16, N))
        f = jax.jit(lambda k, i: jax.lax.sort((k, i), dimension=1, is_stable=False, num_keys=1)[1][:, ::65536].sum())
        print(f"lax.sort (16, 2^{int(np.log2(N))}): {timeit(f, keys, idx)*1e3:.2f}ms", flush=True)
elif which == "gather":
    N = 1 << 20
    pts = jnp.asarray(rng.integers(0, 1 << 16, (N, 32), dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    g = jax.jit(lambda p_, i_: jnp.take(p_, i_, axis=0).sum(axis=0))
    dt = timeit(g, pts, perm, n=5)
    print(f"gather (2^20,32)+sum: {dt*1e3:.2f}ms ({N*32*4*2/dt/1e9:.0f} GB/s)", flush=True)
elif which == "cumsum":
    x = jnp.asarray(rng.integers(0, 2, (16, 1 << 20), dtype=np.uint32))
    c = jax.jit(lambda v: jnp.cumsum(v, axis=1)[:, ::65536].sum())
    print(f"cumsum (16,2^20): {timeit(c, x, n=5)*1e3:.2f}ms", flush=True)
elif which == "empty":
    x = jnp.zeros((8, 128), jnp.uint32)
    f = jax.jit(lambda v: v.sum())
    print(f"empty dispatch: {timeit(f, x, n=20)*1e3:.2f}ms", flush=True)
