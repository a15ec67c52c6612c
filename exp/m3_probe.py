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
    t0 = time.perf_counter()
    for _ in range(warm):
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / n, tc

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
for lanes in (1024,):
    ts = {}
    for T in (16, 64):
        k = jax.jit(pl.pallas_call(
            mul_chain_kernel_factory(T, lanes),
            out_shape=jax.ShapeDtypeStruct((nl, lanes), jnp.uint32),
        ))
        a = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
        ts[T], tc = timeit(k, a, b, n=50)
        print(f"lanes={lanes} T={T}: {ts[T]*1e6:.1f}us (compile {tc:.1f}s)")
    marg = (ts[64] - ts[16]) / 48
    print(f"lanes={lanes}: marginal mul = {marg*1e9:.1f}ns -> {lanes/marg/1e9:.2f}G lane-muls/s")

# grid-step overhead: fixed total muls (512), varying grid split
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
for (T, G) in ((8, 64), (32, 16)):
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
    dt, tc = timeit(k, a, b, n=30)
    print(f"grid G={G} T={T} (512 muls): {dt*1e6:.1f}us (compile {tc:.1f}s)")
