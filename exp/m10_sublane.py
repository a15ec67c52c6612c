"""Probe: does laying a 1024-lane limb row out as (8,128) instead of
(1,1024) change VPU throughput? If Mosaic stores (1,1024) as 8 underfilled
(8,128) registers, full-tile rows should be ~8x faster."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

from zokrates_tpu.kernels.pallas_field import _F, _split, _join
from zokrates_tpu.fields.params import BASE_FIELDS

p = BASE_FIELDS["bn128"].p
F = _F(p)
nl = F.nl
rng = np.random.default_rng(0)

def bench(name, rows_shape, T=16, G=512):
    """rows_shape: shape of ONE limb row holding 1024 lanes."""
    H = rows_shape[0]
    def kernel(a_ref, b_ref, o_ref, acc):
        F.prep(rows_shape[1])
        t = pl.program_id(0)
        @pl.when(t == 0)
        def _():
            acc[...] = a_ref[...]
        a = [acc[i * H : (i + 1) * H] for i in range(nl)]
        b = [b_ref[i * H : (i + 1) * H] for i in range(nl)]
        for _ in range(T):
            a = F.mul(a, b)
        acc[...] = jnp.concatenate(a, axis=0)
        @pl.when(t == G - 1)
        def _():
            o_ref[...] = acc[...]
    shape = (nl * H, rows_shape[1])
    spec = pl.BlockSpec(shape, lambda t: (0, 0), memory_space=pltpu.VMEM)
    k = jax.jit(pl.pallas_call(kernel, grid=(G,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
        scratch_shapes=[pltpu.VMEM(shape, jnp.uint32)]))
    a = jnp.asarray(rng.integers(0, 1 << 16, shape, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, shape, dtype=np.uint32))
    t0 = time.perf_counter(); r = k(a, b); np.asarray(r); tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        r = k(a, b)
        np.asarray(r)
    dt = (time.perf_counter() - t0) / 3
    per = dt / (T * G)
    lanes = rows_shape[0] * rows_shape[1]
    print(f"{name}: {dt*1e3:.1f}ms compile={tc:.0f}s -> {per*1e9:.0f}ns per {lanes}-lane mul "
          f"({lanes*T*G/dt/1e6:.1f} M fieldmul/s)", flush=True)

bench("rows (1,1024)", (1, 1024))
bench("rows (8,128) ", (8, 128))
bench("rows (8,256) ", (8, 256))
bench("rows (16,128)", (16, 128))
