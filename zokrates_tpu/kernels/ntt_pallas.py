"""Whole-transform Pallas NTT: all log2(n) butterfly stages in ONE kernel.

The XLA radix-2 NTT (kernels/ntt.py) emits ~7 ops per stage per transform
— at n = 2^15 the Groth16 h pipeline's 7 transforms cost ~500 XLA ops of
mostly fixed overhead (measured ~30 ms of the prove's device time for
~1 ms of arithmetic). This kernel runs the entire transform with the
array resident in VMEM: grid (transform, stage), state persisted in a
VMEM scratch across stage steps, one full-length Montgomery twiddle table
per stage streamed from HBM.

Layout: a transform is (nl, S, 128) u32 — 16-bit Montgomery limbs on the
leading axis, element v at (sublane v >> 7, lane v & 127), S = n / 128.
Stage s (DIT, bit-reversed input) pairs elements at distance d = 2^s:
  u      = x * TW_s          (TW_s[v] = w_m^(v & (d-1)) if v & d else 1)
  y[v]   = x[v] + u[v + d]        (v & d == 0 — low half)
  y[v]   = x[v - d] - u[v]        (v & d != 0 — high half)
Both rolls stay inside a group of size 2d, so a lane-axis roll realizes
d < 128 and a sublane-axis roll d >= 128 — the (v & d) masks make the
wrapped positions irrelevant.

Mirrors arkworks Radix2EvaluationDomain (the reference's NTT provider via
zokrates_ark); bit-reversal, 1/n scaling and coset twists stay in XLA
(one op each, see ntt.py Domain which dispatches here on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.jfield import field_spec
from .pallas_field import _join, _split, field_for


def _kernel_factory(p: int, k: int, S: int, compact: bool):
    F = field_for(p, None, compact=compact)
    nl = F.nl
    tail = (S, 128)

    def kernel(x_ref, tw_ref, o_ref, xs):
        F.prep(tail)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            xs[...] = x_ref[0]

        x = [xs[i : i + 1] for i in range(nl)]
        tw = [tw_ref[0, i : i + 1] for i in range(nl)]
        u = F.mul(x, tw)

        d = jnp.uint32(1) << s.astype(jnp.uint32)
        sub = jax.lax.broadcasted_iota(jnp.uint32, (1,) + tail, 1)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (1,) + tail, 2)
        v = sub * np.uint32(128) + lane
        low = (v & d) == 0

        def butterfly(axis, shift):
            u_dn = [pltpu.roll(r, -shift, axis) for r in u]
            x_up = [pltpu.roll(r, shift, axis) for r in x]
            y_lo = F.add(x, u_dn)
            y_hi = F.sub(x_up, u)
            return F.select(low, y_lo, y_hi)

        @pl.when(s < 7)
        def _():
            xs[...] = _join(butterfly(2, jnp.int32(1) << s))

        @pl.when(s >= 7)
        def _():
            xs[...] = _join(butterfly(1, jnp.int32(1) << jnp.maximum(s - 7, 0)))

        @pl.when(s == k - 1)
        def _():
            o_ref[0] = xs[...]

    return kernel


@functools.lru_cache(maxsize=None)
def _ntt_call(p: int, n: int, n_arr: int, interpret: bool):
    nl = field_spec(p).nl
    k = n.bit_length() - 1
    S = n // 128
    kernel = _kernel_factory(p, k, S, compact=interpret)
    return pl.pallas_call(
        kernel,
        grid=(n_arr, k),
        in_specs=[
            pl.BlockSpec(
                (1, nl, S, 128), lambda i, s: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nl, S, 128), lambda i, s: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nl, S, 128), lambda i, s: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_arr, nl, S, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((nl, S, 128), jnp.uint32)],
        # At n = 2^15 (S = 256) the double-buffered blocks + mul
        # temporaries need ~18 MB of scoped VMEM — just over the 16 MB
        # default. Raise the budget for THIS kernel only (the global
        # scoped-vmem flag is dangerous: round 2's 96 MB setting made
        # XLA emit fused programs that faulted the TPU worker).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024),
        interpret=interpret,
    )


# twiddle tables: (k, nl, S, 128) u32 per (domain, direction), device-cached
_TW_CACHE = {}


def _tw_tables(dom, inverse: bool):
    key = (dom.p, dom.n, inverse)
    t = _TW_CACHE.get(key)
    if t is None:
        # computed ENTIRELY on the host from ints: this cache is populated
        # lazily, possibly while tracing the fused prover — device ops here
        # (e.g. ops.encode, a jitted call) would return tracers and poison
        # the cache (same failure mode as Domain._coset_powers, ntt.py).
        from ..fields.limbs import LIMB_BITS, ints_to_limbs

        nl = dom.ops.nl
        p, n = dom.p, dom.n
        rr = pow(2, LIMB_BITS * nl, p)  # Montgomery factor
        omega = dom.omega_inv if inverse else dom.omega
        rows = []
        for s in range(dom.k):
            d = 1 << s
            m = 2 * d
            w_m = pow(omega, n // m, p)
            group = [rr] * d  # Montgomery 1 on the low half
            acc = 1
            for _ in range(d):
                group.append(acc * rr % p)
                acc = acc * w_m % p
            full = np.asarray(
                ints_to_limbs(group * (n // m), nl), dtype=np.uint32
            )  # (n, nl)
            rows.append(full.reshape(n // 128, 128, nl).transpose(2, 0, 1))
        # cache NUMPY, not a device array: jnp.asarray STAGES (device_put)
        # when called under a jit trace, so caching its result here would
        # leak a tracer into later traces (observed as UnexpectedTracerError
        # in the single prove after the batch prove populated the cache)
        t = np.ascontiguousarray(np.stack(rows))  # (k, nl, S, 128)
        _TW_CACHE[key] = t
    return t


def fft_core_pallas(dom, x: jnp.ndarray, inverse: bool, interpret: bool = False):
    """Drop-in for Domain._fft_core (WITHOUT the ifft 1/n scaling):
    x (..., n, nl) Montgomery limbs -> transformed, natural order."""
    n, nl = x.shape[-2], x.shape[-1]
    assert n == dom.n
    lead = x.shape[:-2]
    n_arr = 1
    for dsz in lead:
        n_arr *= dsz
    xb = x.reshape(n_arr, n, nl)
    xb = jnp.take(xb, dom.bitrev, axis=1)
    xt = xb.transpose(0, 2, 1).reshape(n_arr, nl, n // 128, 128)
    out = _ntt_call(dom.p, n, n_arr, interpret)(xt, _tw_tables(dom, inverse))
    return (
        out.reshape(n_arr, nl, n).transpose(0, 2, 1).reshape(lead + (n, nl))
    )
