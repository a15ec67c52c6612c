import time, sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from zokrates_tpu.kernels.pallas_field import _F, _split, _join, _mixed_add_inline
from zokrates_tpu.fields.params import BASE_FIELDS

p = BASE_FIELDS["bn128"].p
F = _F(p)
nl = F.nl
rng = np.random.default_rng(0)

def bench_walk(lanes, R, G):
    """Accumulation-walk shape: grid (G,) steps; each step streams R rows of
    (nl, lanes) Qx/Qy from HBM and does R sequential mixed-adds into acc."""
    def kernel(qx_ref, qy_ref, o_ref, accx, accy, accz):
        F.prep(lanes)
        t = pl.program_id(0)
        @pl.when(t == 0)
        def _():
            accx[...] = qx_ref[0]
            accy[...] = qy_ref[0]
            accz[...] = jnp.concatenate([jnp.full((1, lanes), v, jnp.uint32) for v in F.r_rows], axis=0)
        cur = (_split(accx[...], nl), _split(accy[...], nl), _split(accz[...], nl))
        for r in range(R):
            Qx = _split(qx_ref[r], nl)
            Qy = _split(qy_ref[r], nl)
            X, Y, Z, _ = _mixed_add_inline(F, cur, Qx, Qy, with_double=False)
            cur = (X, Y, Z)
        accx[...] = _join(cur[0]); accy[...] = _join(cur[1]); accz[...] = _join(cur[2])
        @pl.when(t == G - 1)
        def _():
            o_ref[0] = accx[...]; o_ref[1] = accy[...]; o_ref[2] = accz[...]

    qspec = pl.BlockSpec((1, R, nl, lanes), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM)
    # reshape refs inside: actually give (G, R*nl, lanes) and index rows
    def kernel2(qx_ref, qy_ref, o_ref, accx, accy, accz):
        F.prep(lanes)
        t = pl.program_id(0)
        @pl.when(t == 0)
        def _():
            accx[...] = qx_ref[0, 0:nl]
            accy[...] = qy_ref[0, 0:nl]
            accz[...] = jnp.concatenate([jnp.full((1, lanes), v, jnp.uint32) for v in F.r_rows], axis=0)
        cur = (_split(accx[...], nl), _split(accy[...], nl), _split(accz[...], nl))
        for r in range(R):
            Qx = [qx_ref[0, r*nl+i:r*nl+i+1] for i in range(nl)]
            Qy = [qy_ref[0, r*nl+i:r*nl+i+1] for i in range(nl)]
            X, Y, Z, _ = _mixed_add_inline(F, cur, Qx, Qy, with_double=False)
            cur = (X, Y, Z)
        accx[...] = _join(cur[0]); accy[...] = _join(cur[1]); accz[...] = _join(cur[2])
        @pl.when(t == G - 1)
        def _():
            o_ref[0] = accx[...]; o_ref[1] = accy[...]; o_ref[2] = accz[...]

    spec = pl.BlockSpec((1, R * nl, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    k = jax.jit(pl.pallas_call(
        kernel2,
        grid=(G,),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((3, nl, lanes), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nl, lanes), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((nl, lanes), jnp.uint32)] * 3,
    ))
    qx = jnp.asarray(rng.integers(0, 1 << 16, (G, R * nl, lanes), dtype=np.uint32))
    qy = jnp.asarray(rng.integers(0, 1 << 16, (G, R * nl, lanes), dtype=np.uint32))
    t0 = time.perf_counter(); r = k(qx, qy); np.asarray(r); tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    NREP = 3
    for _ in range(NREP):
        r = k(qx, qy)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / NREP
    adds = R * G
    lane_adds = adds * lanes
    print(f"lanes={lanes} R={R} G={G}: {dt*1e3:.2f}ms compile={tc:.0f}s -> {lane_adds/dt/1e6:.1f}M lane-adds/s ({dt/adds*1e6:.2f}us/add-row)")

bench_walk(1024, 8, 256)
bench_walk(1024, 8, 2048)
bench_walk(2048, 8, 1024)
bench_walk(1024, 16, 1024)
