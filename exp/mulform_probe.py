"""Montgomery-mul form shootout inside a Pallas kernel: the production
tensor-form CIOS (concat-based limb shifts, few big instructions) vs a
row-form CIOS (per-limb rows, no concats, many small instructions).

Measures steady-state runtime and compile time of a kernel that chains
DEPTH dependent muls over (nl, 8, 128) blocks."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
from zokrates_tpu.tpu_env import ensure_tpu_flags

ensure_tpu_flags()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zokrates_tpu.fields import params as P
from zokrates_tpu.fields.limbs import LIMB_BITS
from zokrates_tpu.kernels.pallas_field import _F, _join, _split

q = P.BASE_FIELDS["bn128"].p
F = _F(q)
nl = F.nl
TAIL = (8, 128)
DEPTH = 64
_MASK = np.uint32((1 << LIMB_BITS) - 1)


def mul_rows(F, a, b):
    """Row-form CIOS: t kept as a list of (1, S, 128) rows, no concats."""
    nlc = F.nl
    t = [jnp.zeros((1,) + F._tail, jnp.uint32) for _ in range(nlc + 1)]
    for i in range(nlc):
        ai = a[i]
        for j in range(nlc):
            prod = ai * b[j]
            t[j] = t[j] + (prod & _MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        m = (t[0] * F.n0inv) & _MASK
        for j in range(nlc):
            pr = m * F.p_rows[j]
            t[j] = t[j] + (pr & _MASK)
            t[j + 1] = t[j + 1] + (pr >> LIMB_BITS)
        carry = t[0] >> LIMB_BITS
        t = [t[1] + carry] + t[2:] + [jnp.zeros_like(t[0])]
    rows, carry = F.carry_sweep(t[:nlc])
    return F.cond_sub_p(rows, carry + t[nlc])


def make_kernel(form):
    def kernel(x_ref, y_ref, o_ref):
        F.prep(TAIL)
        a = [x_ref[i : i + 1] for i in range(nl)]
        b = [y_ref[i : i + 1] for i in range(nl)]
        mulfn = F.mul if form == "tensor" else lambda u, v: mul_rows(F, u, v)
        acc = a
        for _ in range(DEPTH):
            acc = mulfn(acc, b)
        o_ref[...] = _join(acc)

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nl,) + TAIL, jnp.uint32),
    )


rng = np.random.default_rng(0)


def enc(v):
    spec_r = pow(2, 16 * nl, q)
    x = v * spec_r % q
    rows = [(x >> (16 * i)) & 0xFFFF for i in range(nl)]
    return jnp.asarray(
        np.stack([np.full(TAIL, r, np.uint32) for r in rows])
    )


xv = int(rng.integers(1, 1 << 60))
yv = int(rng.integers(1, 1 << 60))
X, Y = enc(xv), enc(yv)

# host expected: x * y^DEPTH * R^{-DEPTH} ... just cross-check forms match
results = {}
for form in ("tensor", "rows"):
    k = make_kernel(form)
    t0 = time.time()
    out = jax.device_get(jax.jit(k)(X, Y))
    print(f"{form}: compile+run {time.time()-t0:.1f}s", flush=True)
    jk = jax.jit(k)
    jax.device_get(jk(X, Y))
    t0 = time.time()
    for _ in range(50):
        o = jk(X, Y)
    jax.device_get(o[0, 0, :1])
    dt = (time.time() - t0) / 50
    per_mul = dt / DEPTH * 1e9
    print(f"{form}: {dt*1e3:.3f} ms/call, {per_mul:.0f} ns/mul (1024 lanes)",
          flush=True)
    results[form] = np.asarray(out)

print("forms agree:", bool((results["tensor"] == results["rows"]).all()), flush=True)
