import time, sys
import numpy as np
import jax, jax.numpy as jnp
rng = np.random.default_rng(1)
def timeit(fn, *args, n=5, warm=1):
    for _ in range(warm):
        r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args); np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / n
N = 1 << 20
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
base = 26.0
for W, dt_ in ((64, np.uint32), (128, np.uint16), (256, np.uint16), (128, np.uint8)):
    pts = jnp.asarray(rng.integers(0, 200, (N, W), dtype=dt_))
    g = jax.jit(lambda p_, i_: jnp.take(p_, i_, axis=0).astype(jnp.uint32).sum(axis=0))
    t = timeit(g, pts, perm, n=5) * 1e3
    nb = N * W * np.dtype(dt_).itemsize * 2
    print(f"take rows (2^20,{W}){np.dtype(dt_).name}: {t:.1f}ms raw, net {t-base:.1f} -> {nb/(t-base)/1e6:.1f} GB/s", flush=True)
# transpose cost (M,K,128)u16 -> (K,128,M)
M, K = 1024, 1024
x = jnp.asarray(rng.integers(0, 200, (M, K, 64), dtype=np.uint16))
tr = jax.jit(lambda v: jnp.transpose(v, (1, 2, 0)).sum(axis=(0, 1)))
t = timeit(tr, x, n=3) * 1e3
print(f"transpose (1024,1024,64)u16->(K,64,M): {t:.1f}ms raw", flush=True)
# widen u16->u32 during transpose
tr2 = jax.jit(lambda v: jnp.transpose(v, (1, 2, 0)).astype(jnp.uint32).sum(axis=(0, 1)))
t = timeit(tr2, x, n=3) * 1e3
print(f"transpose+widen: {t:.1f}ms raw", flush=True)
