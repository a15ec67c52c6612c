"""Distributed NTT: four-step algorithm over a device mesh.

The classic large-FFT decomposition mapped to TPU collectives (the
communication pattern the survey calls out as structurally identical to
Ulysses-style sequence parallelism): with n = n1*n2 and the array viewed as
(n1, n2) sharded on columns,

  1. NTT_n1 over axis 0          — local (each device owns whole columns)
  2. twiddle by omega^(i*j)      — local
  3. reshard columns->rows       — jax.lax.all_to_all over ICI
  4. NTT_n2 over axis 1          — local
  5. output element k2*n1+k1 sits at Z[k1, k2] (transposed order)

The transposed output order composes freely with pointwise ops; untranspose
only at the boundary (Groth16's h pipeline keeps everything in four-step
order between forward and inverse transforms).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields.jfield import field_ops
from ..kernels.ntt import Domain


class FourStepNTT:
    """n = n1 * n2 NTT over field p, ready for a mesh axis over n2 columns
    (and n1 rows after the transpose)."""

    def __init__(self, p: int, n1: int, n2: int, two_adic_root: int, two_adicity: int):
        self.p = p
        self.n1, self.n2 = n1, n2
        self.n = n1 * n2
        self.ops = field_ops(p)
        k = self.n.bit_length() - 1
        assert self.n == 1 << k
        self.omega = pow(two_adic_root, 1 << (two_adicity - k), p)
        self.dom1 = Domain.__new__(Domain)
        self._init_subdomain(self.dom1, pow(self.omega, n2, p), n1)
        self.dom2 = Domain.__new__(Domain)
        self._init_subdomain(self.dom2, pow(self.omega, n1, p), n2)
        # outer twiddles w^(i*j), shaped (n1, n2) — built lazily per shard
        self._tw_cache = {}

    def _init_subdomain(self, dom, omega, n):
        import numpy as np

        dom.p = self.p
        dom.n = n
        dom.k = n.bit_length() - 1
        dom.ops = self.ops
        dom.omega = omega
        dom.omega_inv = pow(omega, -1, self.p)
        dom.n_inv = pow(n, -1, self.p)
        dom._tw = dom._make_twiddles(dom.omega)
        dom._tw_inv = dom._make_twiddles(dom.omega_inv)
        idx = np.arange(n, dtype=np.int64)
        rev = np.zeros(n, dtype=np.int64)
        for b in range(dom.k):
            rev = (rev << 1) | ((idx >> b) & 1)
        dom.bitrev = jnp.asarray(rev.astype(np.int32))
        dom.n_inv_mont = self.ops.encode_scalar(dom.n_inv)
        dom.fft_jit = jax.jit(dom.fft)
        dom.ifft_jit = jax.jit(dom.ifft)

    def twiddles_for_cols(self, col_start: int, cols: int, inv: bool = False):
        """(n1, cols) twiddle block w^(±i*(col_start+j)), Montgomery."""
        key = (col_start, cols, inv)
        if key not in self._tw_cache:
            om = pow(self.omega, -1, self.p) if inv else self.omega
            vals = []
            for i in range(self.n1):
                row_base = pow(om, i * col_start, self.p)
                step = pow(om, i, self.p)
                acc = row_base
                for j in range(cols):
                    vals.append(acc)
                    acc = acc * step % self.p
            tw = self.ops.encode(vals).reshape(self.n1, cols, -1)
            self._tw_cache[key] = tw
        return self._tw_cache[key]

    def twiddles_for_rows(self, row_start: int, rows: int, inv: bool = False):
        """(rows, n2) twiddle block w^(±(row_start+i)*j), Montgomery."""
        key = ("r", row_start, rows, inv)
        if key not in self._tw_cache:
            om = pow(self.omega, -1, self.p) if inv else self.omega
            vals = []
            for i in range(rows):
                base = pow(om, row_start + i, self.p)
                acc = 1
                for j in range(self.n2):
                    vals.append(acc)
                    acc = acc * base % self.p
            tw = self.ops.encode(vals).reshape(rows, self.n2, -1)
            self._tw_cache[key] = tw
        return self._tw_cache[key]

    def coset_scale_rows(self, g: int, row_start: int, rows: int):
        """(rows, n2) block of g^(j2*n1 + j1) for the TRANSPOSED coefficient
        layout Z[j1, j2] = c[j2*n1 + j1] (j1 = row_start+i local rows)."""
        key = ("cs", g, row_start, rows)
        if key not in self._tw_cache:
            gn1 = pow(g, self.n1, self.p)
            vals = []
            for i in range(rows):
                acc = pow(g, row_start + i, self.p)
                for j in range(self.n2):
                    vals.append(acc)
                    acc = acc * gn1 % self.p
            cs = self.ops.encode(vals).reshape(rows, self.n2, -1)
            self._tw_cache[key] = cs
        return self._tw_cache[key]


def ntt_sharded(fs: FourStepNTT, mesh: Mesh, axis: str = "dom"):
    """Sharded forward NTT: input (n1, n2, nl) sharded on axis 1; output
    Z with Z[k1, k2] = A[k2*n1 + k1], sharded on axis 0."""
    ndev = mesh.shape[axis]
    assert fs.n2 % ndev == 0 and fs.n1 % ndev == 0
    cols = fs.n2 // ndev
    f = fs.ops

    # per-device twiddle blocks stacked: (ndev, n1, cols, nl)
    tw = jnp.stack(
        [fs.twiddles_for_cols(d * cols, cols) for d in range(ndev)], axis=0
    )

    def local(x, tw_all):
        # x: (n1, cols, nl) — this device's columns
        idx = jax.lax.axis_index(axis)
        # step 1: NTT_n1 over axis 0 (move to axis -2 for Domain.fft)
        xt = jnp.swapaxes(x, 0, 1)          # (cols, n1, nl)
        y = fs.dom1.fft(xt)
        y = jnp.swapaxes(y, 0, 1)           # (n1, cols, nl)
        # step 2: twiddle
        y = f.mul_(y, tw_all[idx])
        # step 3: reshard: split axis 0 (n1) across devices, concat axis 1
        # all_to_all: (n1, cols, nl) -> (n1/ndev, cols*ndev, nl)
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1, tiled=True)
        # step 4: NTT_n2 over axis 1 — rows now complete
        z = fs.dom2.fft(y)                   # transform trailing (n2, nl)
        return z

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(axis, None, None),
        check_rep=False,
    )
    return jax.jit(lambda x: fn(x, tw))


# ---------------------------------------------------------------------------
# The remaining three transform directions (all four are needed to close the
# Groth16 h-pipeline under a mesh without ever forming the full vector on one
# device). Layout vocabulary:
#   natural    x[i1, i2] = a[i1*n2 + i2], sharded on columns  P(None, axis)
#   transposed Z[k1, k2] = â[k2*n1 + k1], sharded on rows     P(axis, None)
# Derivations follow the ω^(ik) = ω1^(i1k1)·ω2^(i2k2)·ω^(i2k1) split; every
# transform is two local sub-NTTs + one twiddle + one all_to_all over ICI.
# ---------------------------------------------------------------------------


def intt_from_transposed(fs: FourStepNTT, mesh: Mesh, axis: str = "dom"):
    """Sharded inverse NTT undoing ntt_sharded: input Z[k1,k2]=â[k2*n1+k1]
    sharded on rows -> natural a[i1*n2+i2] sharded on columns."""
    ndev = mesh.shape[axis]
    rows = fs.n1 // ndev
    f = fs.ops
    ifft1, ifft2 = fs.dom1.ifft, fs.dom2.ifft
    tw = jnp.stack(
        [fs.twiddles_for_rows(d * rows, rows, inv=True) for d in range(ndev)]
    )

    def local(z, tw_all):
        idx = jax.lax.axis_index(axis)
        y = ifft2(z)                        # (rows, n2, nl): k2 -> i2 (1/n2)
        y = f.mul_(y, tw_all[idx])          # ω^(-i2·k1)
        y = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=0, tiled=True)
        yt = jnp.swapaxes(y, 0, 1)          # (n2/ndev, n1, nl)
        x = ifft1(yt)                       # k1 -> i1 (1/n1)
        return jnp.swapaxes(x, 0, 1)        # (n1, n2/ndev, nl) natural

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None), P()),
        out_specs=P(None, axis, None),
        check_rep=False,
    )
    return jax.jit(lambda z: fn(z, tw))


def ntt_from_transposed(fs: FourStepNTT, mesh: Mesh, axis: str = "dom"):
    """Forward NTT taking TRANSPOSED-layout coefficients (Z[j1,j2] =
    c[j2*n1+j1], row-sharded) -> natural-order evaluations (column-sharded).
    Composes with intt_to_transposed for the coset round-trip."""
    ndev = mesh.shape[axis]
    rows = fs.n1 // ndev
    f = fs.ops
    tw = jnp.stack(
        [fs.twiddles_for_rows(d * rows, rows, inv=False) for d in range(ndev)]
    )

    def local(z, tw_all):
        idx = jax.lax.axis_index(axis)
        y = fs.dom2.fft(z)                  # j2 -> i2
        y = f.mul_(y, tw_all[idx])          # ω^(+i2·j1)
        y = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=0, tiled=True)
        yt = jnp.swapaxes(y, 0, 1)
        x = fs.dom1.fft(yt)                 # j1 -> i1
        return jnp.swapaxes(x, 0, 1)        # natural evals

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None), P()),
        out_specs=P(None, axis, None),
        check_rep=False,
    )
    return jax.jit(lambda z: fn(z, tw))


def intt_to_transposed(fs: FourStepNTT, mesh: Mesh, axis: str = "dom"):
    """Inverse NTT taking natural-order evaluations (column-sharded) ->
    TRANSPOSED-layout coefficients Z[j1,j2] = c[j2*n1+j1] (row-sharded)."""
    ndev = mesh.shape[axis]
    cols = fs.n2 // ndev
    f = fs.ops
    ifft1, ifft2 = fs.dom1.ifft, fs.dom2.ifft
    tw = jnp.stack(
        [fs.twiddles_for_cols(d * cols, cols, inv=True) for d in range(ndev)]
    )

    def local(x, tw_all):
        idx = jax.lax.axis_index(axis)
        xt = jnp.swapaxes(x, 0, 1)          # (cols, n1, nl)
        y = ifft1(xt)                       # i1 -> j1 (1/n1)
        y = jnp.swapaxes(y, 0, 1)           # (n1, cols, nl)
        y = f.mul_(y, tw_all[idx])          # ω^(-i2·j1)
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1, tiled=True)
        return ifft2(y)                     # i2 -> j2 (1/n2) -> (n1/ndev, n2)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(axis, None, None),
        check_rep=False,
    )
    return jax.jit(lambda x: fn(x, tw))


def reshard_rows_to_cols(mesh: Mesh, axis: str):
    """Natural (n1, n2) row-sharded P(axis, None) -> column-sharded
    P(None, axis) (pure data movement, one all_to_all)."""

    def local(x):
        return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=0, tiled=True)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis, None, None),),
            out_specs=P(None, axis, None),
            check_rep=False,
        )
    )
