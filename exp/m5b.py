import time, sys
import numpy as np
import jax, jax.numpy as jnp
rng = np.random.default_rng(1)
def timeit(fn, *args, n=3, warm=1):
    t0=time.perf_counter()
    for _ in range(warm):
        r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    print(f"  (compile+first: {time.perf_counter()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / n

which = sys.argv[1]
if which == "sort18":
    N = 1 << 18
    keys = jnp.asarray(rng.integers(0, 1 << 15, (16, N), dtype=np.uint32))
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None], (16, N))
    f = jax.jit(lambda k, i: jax.lax.sort((k, i), dimension=1, is_stable=False, num_keys=1))
    print(f"lax.sort (16, 2^18): {timeit(f, keys, idx)*1e3:.2f}ms", flush=True)
elif which == "gather":
    N = 1 << 20
    pts = jnp.asarray(rng.integers(0, 1 << 16, (N, 32), dtype=np.uint32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    g = jax.jit(lambda p_, i_: jnp.take(p_, i_, axis=0))
    dt = timeit(g, pts, perm, n=3)
    print(f"gather (2^20,32): {dt*1e3:.2f}ms ({N*32*4*2/dt/1e9:.0f} GB/s)", flush=True)
elif which == "cumsum":
    x = jnp.asarray(rng.integers(0, 2, (16, 1 << 20), dtype=np.uint32))
    c = jax.jit(lambda v: jnp.cumsum(v, axis=1))
    print(f"cumsum (16,2^20): {timeit(c, x, n=3)*1e3:.2f}ms", flush=True)
