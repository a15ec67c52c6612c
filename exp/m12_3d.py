"""Probe: Montgomery mul throughput, (1,1024)-row layout vs (8,128)-row 3D
layout. Row-wise ops on (1,1024) fill 1/8 of each (8,128) VPU register;
if those dominate, the 3D layout should be markedly faster."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, "/root/repo")

import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zokrates_tpu.fields.params import BASE_FIELDS
from zokrates_tpu.fields.jfield import field_spec

p = BASE_FIELDS["bn128"].p
spec = field_spec(p)
nl = spec.nl
N0INV = np.uint32(spec.n0inv)
P_LIMBS = [np.uint32(v) for v in spec.p_limbs]
MASK = np.uint32((1 << 16) - 1)

rng = np.random.default_rng(0)
T, G = 16, 512


def mul_generic(a, b, zrow, p_col):
    """CIOS over stacked tensors; a,b: (nl, *lane), zrow: (1, *lane)."""
    def step(t, ai):
        prod = ai * b
        lo = jnp.concatenate([prod & MASK, zrow], axis=0)
        hi = jnp.concatenate([zrow, prod >> 16], axis=0)
        t = t + lo + hi
        m = (t[0:1] * N0INV) & MASK
        prod2 = m * p_col
        lo2 = jnp.concatenate([prod2 & MASK, zrow], axis=0)
        hi2 = jnp.concatenate([zrow, prod2 >> 16], axis=0)
        t = t + lo2 + hi2
        carry = t[0:1] >> 16
        return jnp.concatenate([t[1:2] + carry, t[2:], zrow], axis=0)

    t = jnp.zeros_like(jnp.concatenate([a, zrow], axis=0))
    for i in range(nl):
        t = step(t, a[i : i + 1])
    # final carry sweep (no cond-sub; throughput probe only)
    out = []
    carry = zrow
    for i in range(nl):
        s = t[i : i + 1] + carry
        out.append(s & MASK)
        carry = s >> 16
    return jnp.concatenate(out, axis=0)


def bench(name, lane_shape):
    shape = (nl,) + lane_shape
    zshape = (1,) + lane_shape

    def kernel(a_ref, b_ref, o_ref, acc):
        zrow = jnp.zeros(zshape, jnp.uint32)
        p_col = jnp.concatenate(
            [jnp.full(zshape, v, jnp.uint32) for v in P_LIMBS], axis=0
        )
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = a_ref[...]

        a = acc[...]
        b = b_ref[...]
        for _ in range(T):
            a = mul_generic(a, b, zrow, p_col)
        acc[...] = a

        @pl.when(t == G - 1)
        def _():
            o_ref[...] = acc[...]

    bs = pl.BlockSpec(shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    k = jax.jit(
        pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[bs, bs],
            out_specs=bs,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
            scratch_shapes=[pltpu.VMEM(shape, jnp.uint32)],
        )
    )
    a = jnp.asarray(rng.integers(0, 1 << 16, shape, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, shape, dtype=np.uint32))
    t0 = time.perf_counter()
    r = k(a, b)
    jax.device_get(r)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(k(a, b))
    dt = (time.perf_counter() - t0) / 3
    lanes = int(np.prod(lane_shape))
    print(
        f"{name}: {dt*1e3:6.1f}ms compile={tc:.0f}s -> "
        f"{lanes*T*G/dt/1e6:7.1f} M fieldmul/s",
        flush=True,
    )


bench("2D (16,1024)  ", (1024,))
bench("3D (16,8,128) ", (8, 128))
bench("3D (16,16,128)", (16, 128))
bench("3D (16,8,256) ", (8, 256))

bench("3D (16,32,128)", (32, 128))
bench("3D (16,64,128)", (64, 128))
