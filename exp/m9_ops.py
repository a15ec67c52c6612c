import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from zokrates_tpu.kernels.pallas_field import _F, _split, _join
from zokrates_tpu.fields.params import BASE_FIELDS
p = BASE_FIELDS["bn128"].p
F = _F(p); nl = F.nl
rng = np.random.default_rng(0)
lanes = 1024

def bench(name, body_fn, T, G=512):
    def kernel(a_ref, b_ref, o_ref, acc):
        F.prep(lanes)
        t = pl.program_id(0)
        @pl.when(t == 0)
        def _():
            acc[...] = a_ref[...]
        a = _split(acc[...], nl)
        b = _split(b_ref[...], nl)
        for _ in range(T):
            a = body_fn(a, b)
        acc[...] = _join(a)
        @pl.when(t == G - 1)
        def _():
            o_ref[...] = acc[...]
    spec = pl.BlockSpec((nl, lanes), lambda t: (0, 0), memory_space=pltpu.VMEM)
    k = jax.jit(pl.pallas_call(kernel, grid=(G,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nl, lanes), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((nl, lanes), jnp.uint32)]))
    a = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (nl, lanes), dtype=np.uint32))
    t0 = time.perf_counter(); r = k(a, b); np.asarray(r); tc = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(3): r = k(a, b)
    np.asarray(r)
    dt = (time.perf_counter()-t0)/3
    per = (dt - 0.026) / (T * G)
    print(f"{name}: T={T} G={G} {dt*1e3:.1f}ms compile={tc:.0f}s -> {per*1e9:.0f}ns/op", flush=True)

which = sys.argv[1]
if which == "mul":
    bench("mul", lambda a, b: F.mul(a, b), 16)
elif which == "add":
    bench("add", lambda a, b: F.add(a, b), 48)
elif which == "sub":
    bench("sub", lambda a, b: F.sub(a, b), 48)
