"""Groth16 proving under a device mesh (tp/dp over the prover's hot axes).

The reference prover's only parallelism is rayon multicore inside arkworks
(SURVEY §2.5). Here the whole prove pipeline runs sharded over one mesh
axis, with XLA collectives over ICI:

  * A·z / B·z / C·z   — COO rows partitioned across devices (each device
    owns a contiguous domain-row block; no cross-device reduction at all),
  * the h(X) pipeline — four-step NTTs (parallel/ntt_dist.py): two local
    sub-transforms + one all_to_all each; the coset scaling and the
    (A∘B - C)·Z⁻¹ pointwise stage stay device-local; intermediate vectors
    are never materialized on fewer than all devices,
  * the five proof MSMs — data-parallel over points (parallel/msm_dist.py),
    per-device Pippenger + an all_gather of one Jacobian point each.

Proofs are bit-identical to schemes/groth16.prove given the same (r, s)
randomness — asserted by tests/test_parallel.py and the driver dryrun.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ec.curve import PointG1, PointG2, g1_group, g2_group
from ..fields import params as FP
from ..fields.jfield import field_ops
from ..fields.limbs import ints_to_limbs, n_limbs
from ..ir.r1cs import R1CS
from ..ir.r1cs_device import R1CSDevice
from ..ir.witness import Witness
from ..kernels.jec import curve_ops, curve_ops_g2
from ..schemes.groth16 import ProvingKey, _next_pow2
from ..schemes.types import Proof, fr_to_json, g1_to_json, g2_to_json
from .msm_dist import msm_sharded
from .ntt_dist import FourStepNTT, intt_to_transposed, ntt_from_transposed

import secrets


def _split_factors(n: int, ndev: int):
    """n = n1 * n2 with ndev | n1 and ndev | n2 (requires n >= ndev^2)."""
    k = n.bit_length() - 1
    kd = ndev.bit_length() - 1
    assert k >= 2 * kd, f"domain 2^{k} too small for {ndev} devices"
    k1 = max(kd, k // 2)
    return 1 << k1, 1 << (k - k1)


def _partition_coo(coo, n: int, ndev: int, nl: int):
    """Row-range partition of a sorted COO matrix into equal-size padded
    per-device blocks (pad entries carry coefficient 0)."""
    rows = np.asarray(jax.device_get(coo.rows))
    cols = np.asarray(jax.device_get(coo.cols))
    coeff = np.asarray(jax.device_get(coo.coeff))
    block = n // ndev
    bounds = np.searchsorted(rows, np.arange(0, n + 1, block))
    counts = np.diff(bounds)
    mx = max(1, int(counts.max()))
    lr = np.zeros((ndev, mx), np.int32)
    lc = np.zeros((ndev, mx), np.int32)
    cf = np.zeros((ndev, mx, nl), np.uint32)
    for d in range(ndev):
        s, e = bounds[d], bounds[d + 1]
        k = e - s
        lr[d, :k] = rows[s:e] - d * block
        lc[d, :k] = cols[s:e]
        cf[d, :k] = coeff[s:e]
        if k < mx:  # pad rows point at the last local row; coeff 0
            lr[d, k:] = block - 1
    return jnp.asarray(lr), jnp.asarray(lc), jnp.asarray(cf)


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    reps = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, reps, mode="edge")


class ShardedGroth16:
    """Per-(pk, mesh) compiled sharded prover."""

    def __init__(self, r1cs: R1CS, pk: ProvingKey, mesh: Mesh, axis: str = "shard"):
        self.r1cs = r1cs
        self.pk = pk
        self.mesh = mesh
        self.axis = axis
        self.curve = r1cs.curve
        self.p = FP.SCALAR_FIELDS[self.curve].p
        self.f = field_ops(self.p)
        self.nl = self.f.nl
        self.n = pk.domain_size
        self.ndev = mesh.shape[axis]
        self.n1, self.n2 = _split_factors(self.n, self.ndev)

        fp = FP.SCALAR_FIELDS[self.curve]
        self.fs = FourStepNTT(self.p, self.n1, self.n2, fp.two_adic_root, fp.two_adicity)
        self._build()

    # -- one-time device/plan construction ----------------------------------
    def _build(self):
        f, n, ndev, axis, mesh = self.f, self.n, self.ndev, self.axis, self.mesh
        p = self.p
        dev = R1CSDevice.build(self.r1cs, n)
        self.coo = {
            M: _partition_coo(getattr(dev, M), n, ndev, self.nl) for M in "ABC"
        }

        g = FP.SCALAR_FIELDS[self.curve].smallest_nonresidue
        zc_inv = pow((pow(g, n, p) - 1) % p, -1, p)
        self.zinv_mont = f.encode_scalar(zc_inv)
        rows = self.n1 // ndev
        self.cs = jnp.stack(
            [self.fs.coset_scale_rows(g, d * rows, rows) for d in range(ndev)]
        )
        self.cs_inv = jnp.stack(
            [
                self.fs.coset_scale_rows(pow(g, -1, p), d * rows, rows)
                for d in range(ndev)
            ]
        )

        self.F_inv = intt_to_transposed(self.fs, mesh, axis)
        self.G_fwd = ntt_from_transposed(self.fs, mesh, axis)

        block = n // ndev

        def mv_local(lr, lc, cf, z):
            vals = f.mul_(cf[0], jnp.take(z, lc[0], axis=0))
            sums = jax.ops.segment_sum(
                vals, lr[0], num_segments=block, indices_are_sorted=True
            )
            return f.reduce_wide_(sums)

        self.matvec = jax.jit(
            shard_map(
                mv_local,
                mesh=mesh,
                in_specs=(P(axis, None), P(axis, None), P(axis, None, None), P()),
                out_specs=P(axis, None),
            check_rep=False,
            )
        )

        def reshard_nat(x):  # natural rows-sharded -> cols-sharded
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=0, tiled=True)

        self.reshard = jax.jit(
            shard_map(
                reshard_nat,
                mesh=mesh,
                in_specs=(P(axis, None, None),),
                out_specs=P(None, axis, None),
                check_rep=False,
            )
        )

        def scale_local(z, tbl):
            return f.mul_(z, tbl[jax.lax.axis_index(axis)])

        self.row_scale = jax.jit(
            shard_map(
                scale_local,
                mesh=mesh,
                in_specs=(P(axis, None, None), P()),
                out_specs=P(axis, None, None),
                check_rep=False,
            )
        )

        def hcs_local(a, b, c):
            return f.mul_(f.sub_(f.mul_(a, b), c), self.zinv_mont)

        self.hcs = jax.jit(
            shard_map(
                hcs_local,
                mesh=mesh,
                in_specs=(P(None, axis, None),) * 3,
                out_specs=P(None, axis, None),
                check_rep=False,
            )
        )

        # --- MSM inputs: queries padded to device multiples ----------------
        pk = self.pk
        grp = g1_group(self.curve)
        self.ops1 = curve_ops(grp.q)
        self.ops2 = curve_ops_g2(self.curve)
        nl1 = self.ops1.f.nl
        m = pk.a_p128.shape[0]
        self.m = m
        mt = -(-m // ndev) * ndev
        self.mt = mt

        def g1_query(p128):
            q = _pad_to(p128, mt)
            return jnp.asarray(q[:, :nl1]), jnp.asarray(q[:, nl1 : 2 * nl1])

        self.qa = g1_query(pk.a_p128)
        self.qb1 = g1_query(pk.b1_p128)
        self.qb2 = (jnp.asarray(_pad_to(pk.b2_x, mt)), jnp.asarray(_pad_to(pk.b2_y, mt)))
        lt = -(-pk.l_p128.shape[0] // ndev) * ndev
        self.lt = lt
        self.ql = (
            jnp.asarray(_pad_to(pk.l_p128, lt)[:, :nl1]),
            jnp.asarray(_pad_to(pk.l_p128, lt)[:, nl1 : 2 * nl1]),
        )
        self.masks = {
            "a": jnp.asarray(np.pad(pk.a_mask, (0, mt - m))),
            "b1": jnp.asarray(np.pad(pk.b1_mask, (0, mt - m))),
            "b2": jnp.asarray(np.pad(pk.b2_mask, (0, mt - m))),
            "l": jnp.asarray(
                np.pad(pk.l_mask, (0, lt - pk.l_mask.shape[0]))
            ),
        }

        # h query permuted into the transposed coefficient layout:
        # position j1*n2 + j2 multiplies coefficient c[j2*n1 + j1]
        hq = _pad_to(pk.h_p128, n)  # coefficient n-1 is identically 0
        j1 = np.arange(self.n1)[:, None]
        j2 = np.arange(self.n2)[None, :]
        perm = (j2 * self.n1 + j1).reshape(-1)
        hqp = hq[perm]
        self.qh = (jnp.asarray(hqp[:, :nl1]), jnp.asarray(hqp[:, nl1 : 2 * nl1]))

        c1 = 8 if self.n >= 4096 else 4
        self.msm1 = msm_sharded(self.ops1, mesh, axis, c=c1)
        self.msm2 = msm_sharded(self.ops2, mesh, axis, c=c1)

    # -- prove ---------------------------------------------------------------
    def _to_g1(self, res) -> PointG1:
        grp = g1_group(self.curve)
        aff = self.ops1.to_affine_ints((res[0][None], res[1][None], res[2][None]))[0]
        return grp.zero() if aff is None else PointG1(grp, aff[0], aff[1])

    def _to_g2(self, res) -> PointG2:
        grp = g2_group(self.curve)
        aff = self.ops2.to_affine_ints((res[0][None], res[1][None], res[2][None]))[0]
        if aff is None:
            return grp.zero()
        from ..ec.tower import Fq2

        return PointG2(
            grp,
            Fq2(grp.tower, aff[0][0], aff[0][1]),
            Fq2(grp.tower, aff[1][0], aff[1][1]),
        )

    def prove(self, witness: Witness, rng=None) -> Proof:
        f, p, n = self.f, self.p, self.n
        pk = self.pk
        rand = rng or (lambda: secrets.randbelow(p))
        ni = pk.num_instance

        z = [v % p for v in self.r1cs.full_assignment(witness)]
        z_can = jnp.asarray(ints_to_limbs(z, self.nl))
        z_mont = f.to_mont(z_can)

        with self.mesh:
            # h pipeline (all sharded)
            evs = []
            for M in "ABC":
                e = self.matvec(*self.coo[M], z_mont)  # (n, nl) rows-sharded
                e = e.reshape(self.n1, self.n2, self.nl)
                evs.append(self.reshard(e))  # natural cols-sharded
            a_c = self.row_scale(self.F_inv(evs[0]), self.cs)
            b_c = self.row_scale(self.F_inv(evs[1]), self.cs)
            c_c = self.row_scale(self.F_inv(evs[2]), self.cs)
            h_cs = self.hcs(self.G_fwd(a_c), self.G_fwd(b_c), self.G_fwd(c_c))
            h_t = self.row_scale(self.F_inv(h_cs), self.cs_inv)
            h_can = f.from_mont_(h_t).reshape(n, self.nl)

            # MSM scalars (replicated; zero where masked / padded)
            def masked(S, mask, nt):
                mrows = S.shape[0]
                S = jnp.where(mask[:mrows, None], S, 0)
                if mrows < nt:
                    S = jnp.pad(S, ((0, nt - mrows), (0, 0)))
                return S

            sa = masked(z_can, self.masks["a"], self.mt)
            sb = masked(z_can, self.masks["b1"], self.mt)
            sb2 = masked(z_can, self.masks["b2"], self.mt)
            # l query is z-aligned (dummies at instance/absent slots are
            # masked out), so l shares the full witness scalar vector
            sl = masked(z_can, self.masks["l"], self.lt)

            a_acc = self._to_g1(self.msm1(self.qa[0], self.qa[1], sa))
            b1_acc = self._to_g1(self.msm1(self.qb1[0], self.qb1[1], sb))
            b2_acc = self._to_g2(self.msm2(self.qb2[0], self.qb2[1], sb2))
            l_acc = self._to_g1(self.msm1(self.ql[0], self.ql[1], sl))
            h_acc = self._to_g1(self.msm1(self.qh[0], self.qh[1], h_can))

        r, s = rand(), rand()
        delta_g1 = pk.delta_g1
        A = pk.alpha_g1 + a_acc + delta_g1 * r
        B1 = pk.beta_g1 + b1_acc + delta_g1 * s
        B2 = pk.beta_g2 + b2_acc + pk.delta_g2 * s
        rs = r * s % p
        C = l_acc + h_acc + A * s + B1 * r - delta_g1 * rs

        curve = self.curve
        inputs = [fr_to_json(z[i], curve) for i in range(1, ni)]
        return Proof(
            "g16",
            curve,
            {
                "a": g1_to_json(A, curve),
                "b": g2_to_json(B2, curve),
                "c": g1_to_json(C, curve),
            },
            inputs,
        )


_CACHE: Dict = {}


def sharded_prover(
    r1cs: R1CS, pk: ProvingKey, mesh: Mesh, axis: str = "shard"
) -> ShardedGroth16:
    key = (id(r1cs), id(pk), id(mesh), axis)
    if key not in _CACHE:
        _CACHE[key] = ShardedGroth16(r1cs, pk, mesh, axis)
    return _CACHE[key]
