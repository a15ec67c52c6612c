"""Multi-device MSM: data-parallel over points via shard_map.

The TPU-native equivalent of arkworks' rayon-parallel Pippenger
(zokrates_ark/Cargo.toml:10 `ark-ec/parallel`), lifted to a device mesh:
points and scalars are sharded along the `points` mesh axis, every device
runs the full windowed bucket pipeline on its shard, and the per-device
partial sums (one Jacobian point each) are combined with an all_gather +
local fold — communication is O(devices), not O(N).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..kernels.jec import CurveOps
from ..kernels.msm import msm


def msm_sharded(ops: CurveOps, mesh: Mesh, axis: str = "points", c: int = 8):
    """Build a pjit-able MSM over a mesh: (Px, Py, scalars) sharded on their
    leading axis -> single Jacobian point (replicated)."""

    ndim_pt = 2 if ops.f.element_ndim == 2 else 1
    pt_spec = P(axis, *([None] * ndim_pt))
    sc_spec = P(axis, None)

    def local_msm(Px, Py, S):
        # per-shard full MSM -> one Jacobian point per device
        X, Y, Z = msm(ops, Px, Py, S, c=c)
        # gather everyone's partial and fold locally (replicated result)
        gx = jax.lax.all_gather(X, axis)  # (ndev, ...)
        gy = jax.lax.all_gather(Y, axis)
        gz = jax.lax.all_gather(Z, axis)
        rx, ry, rz = ops.tree_reduce((gx, gy, gz))
        return rx[0], ry[0], rz[0]

    fn = shard_map(
        local_msm,
        mesh=mesh,
        in_specs=(pt_spec, pt_spec, sc_spec),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)
