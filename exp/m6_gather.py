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
base = 26.0  # ms dispatch overhead

for W in (8, 32, 128):
    pts = jnp.asarray(rng.integers(0, 1 << 16, (N, W), dtype=np.uint32))
    g = jax.jit(lambda p_, i_: jnp.take(p_, i_, axis=0).sum(axis=0))
    dt = timeit(g, pts, perm, n=5) * 1e3
    print(f"take rows (2^20,{W}): {dt:.1f}ms raw, ~{dt-base:.1f}ms net -> {N*W*4*2/(dt-base)/1e6:.1f} GB/s", flush=True)

# gather via sorted (locality-friendly) indices
pts = jnp.asarray(rng.integers(0, 1 << 16, (N, 32), dtype=np.uint32))
# indices from a realistic digit sort: ~32k runs of avg 32 spread randomly
digits = rng.integers(0, 1 << 15, N).astype(np.uint32)
perm2 = jnp.asarray(np.argsort(digits, kind="stable").astype(np.int32))
g = jax.jit(lambda p_, i_: jnp.take(p_, i_, axis=0).sum(axis=0))
dt = timeit(g, pts, perm2, n=5) * 1e3
print(f"take rows digit-perm: {dt:.1f}ms raw", flush=True)

# one take for 4 windows at once
permW = jnp.asarray(np.stack([rng.permutation(N) for _ in range(4)]).astype(np.int32))
gW = jax.jit(lambda p_, i_: jnp.take(p_, i_.reshape(-1), axis=0).sum(axis=0))
dt = timeit(gW, pts, permW, n=3) * 1e3
print(f"take rows 4 windows fused: {dt:.1f}ms raw -> per-window {(dt-base)/4:.1f}ms", flush=True)

# gather along minor axis of transposed layout (32, N)
ptsT = jnp.asarray(rng.integers(0, 1 << 16, (32, N), dtype=np.uint32))
gT = jax.jit(lambda p_, i_: jnp.take(p_, i_, axis=1).sum(axis=1))
dt = timeit(gT, ptsT, perm, n=3) * 1e3
print(f"take cols (32,2^20): {dt:.1f}ms raw", flush=True)
