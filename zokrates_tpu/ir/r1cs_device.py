"""Device-resident R1CS: COO constraint matrices + sparse matvec on TPU.

The reference prover streams constraints into arkworks' ConstraintSystem
and evaluates A·z / B·z / C·z inside ark-groth16 with rayon
(zokrates_ark/src/lib.rs:80-130 feeding ark's prover). Round 1 evaluated
these with a per-nonzero host Python loop (schemes/groth16.py round-1
`_matrix_evals`), which cannot reach 2^20 constraints. Here the matrices
live on device as sorted COO arrays and each matvec is:

    gather z[col] -> Montgomery mul by coeff -> u32 segment_sum per limb
    (lazy: 16-bit limbs accumulate exactly in uint32 for <= 2^15 terms)
    -> one reduce_wide per output row.

The instance-binding rows ark appends (A[nc + j] = z_j, binding public
inputs into the A polynomial) are materialized as ordinary COO entries so
the QAP domain logic downstream needs no special cases.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import params as P
from ..fields.jfield import field_ops
from ..fields.limbs import ints_to_limbs, n_limbs
from .r1cs import R1CS

# u32 limb columns hold sums of 16-bit terms exactly up to 2^16 entries;
# stay a factor 2 below to leave headroom for the reduce_wide carry sweep.
MAX_ROW_TERMS = 1 << 15


@dataclass
class COOMatrix:
    rows: jnp.ndarray  # (nnz,) int32, sorted ascending
    cols: jnp.ndarray  # (nnz,) int32
    coeff: jnp.ndarray  # (nnz, nl) uint32 Montgomery
    n_rows: int

    def matvec(self, f, z_mont: jnp.ndarray) -> jnp.ndarray:
        """A·z over F_r: z_mont (m, nl) Montgomery -> (n_rows, nl) Montgomery."""
        vals = f.mul_(self.coeff, jnp.take(z_mont, self.cols, axis=0))
        sums = jax.ops.segment_sum(
            vals, self.rows, num_segments=self.n_rows, indices_are_sorted=True
        )
        return f.reduce_wide_(sums)


def _to_coo(rows_py: List[List[Tuple[int, int]]], extra, n_rows: int, p: int) -> COOMatrix:
    f = field_ops(p)
    nl = n_limbs(p)
    r_idx: List[int] = []
    c_idx: List[int] = []
    coeffs: List[int] = []
    for r, row in enumerate(rows_py):
        if len(row) > MAX_ROW_TERMS:
            raise ValueError(
                f"constraint row {r} has {len(row)} terms (> {MAX_ROW_TERMS}); "
                "lazy u32 accumulation would overflow"
            )
        for col, coef in row:
            r_idx.append(r)
            c_idx.append(col)
            coeffs.append(coef % p)
    for r, col, coef in extra:
        r_idx.append(r)
        c_idx.append(col)
        coeffs.append(coef % p)
    if not r_idx:  # degenerate: keep one zero entry so shapes are non-empty
        r_idx, c_idx, coeffs = [0], [0], [0]
    order = np.argsort(np.asarray(r_idx, dtype=np.int64), kind="stable")
    r_arr = np.asarray(r_idx, dtype=np.int32)[order]
    c_arr = np.asarray(c_idx, dtype=np.int32)[order]
    co = ints_to_limbs([coeffs[i] for i in order], nl)
    co_mont = f.to_mont(jnp.asarray(co))
    out = COOMatrix(jnp.asarray(r_arr), jnp.asarray(c_arr), co_mont, n_rows)
    # numpy sidecars for host-side planning (the mulacc-walk layout)
    out.rows_np = r_arr
    out.cols_np = c_arr
    out.coeff_np = np.asarray(jax.device_get(co_mont))
    return out


@dataclass
class R1CSDevice:
    """The three COO matrices over the padded QAP domain (size n), with
    ark's instance-binding rows included in A."""

    curve: str
    n: int  # domain size (power of two >= nc + ni)
    num_instance: int
    num_witness: int
    A: COOMatrix
    B: COOMatrix
    C: COOMatrix

    @property
    def num_variables(self) -> int:
        return self.num_instance + self.num_witness

    @staticmethod
    def build(r1cs: R1CS, n: int) -> "R1CSDevice":
        p = P.SCALAR_FIELDS[r1cs.curve].p
        nc, ni = r1cs.num_constraints, r1cs.num_instance
        assert n >= nc + ni
        binding = [(nc + j, j, 1) for j in range(ni)]
        return R1CSDevice(
            curve=r1cs.curve,
            n=n,
            num_instance=ni,
            num_witness=r1cs.num_witness,
            A=_to_coo(r1cs.A, binding, n, p),
            B=_to_coo(r1cs.B, [], n, p),
            C=_to_coo(r1cs.C, [], n, p),
        )

    def matvecs(self, z_mont: jnp.ndarray):
        f = field_ops(P.SCALAR_FIELDS[self.curve].p)
        return (
            self.A.matvec(f, z_mont),
            self.B.matvec(f, z_mont),
            self.C.matvec(f, z_mont),
        )


@dataclass
class MulaccWalk:
    """Precomputed walk-layout plan for the fused 3-matrix sparse matvec
    (kernels/pallas_field.mulacc_walk). All index structure is
    circuit-static: records are the row-sorted concatenation of the A, B,
    C COO entries with rows offset into disjoint blocks of 3n segments;
    lane m of M = S*128 owns records [m*K, (m+1)*K)."""

    cols: jnp.ndarray        # (Lp,) int32 gather indices into z
    coeff_walk: jnp.ndarray  # (K, nl, S, 128) Montgomery coefficients
    flags_walk: jnp.ndarray  # (T, R, S, 128) u32 flush flags
    pos: jnp.ndarray         # (P,) int32 flush positions in record space
    seg: jnp.ndarray         # (P,) int32 segment (row) ids, sorted
    K: int
    R: int
    S: int
    n_rows: int              # 3n

    @property
    def M(self) -> int:
        return self.S * 128


_MULACC_R = 4
_MULACC_S = 8  # M = 1024 lanes


def build_mulacc_walk(dev: "R1CSDevice") -> MulaccWalk:
    """Build (and cache on dev) the walk plan from the numpy COO sidecars."""
    cached = getattr(dev, "_mulacc_walk", None)
    if cached is not None:
        return cached
    n = dev.n
    nl = dev.A.coeff_np.shape[1]
    rows = np.concatenate(
        [dev.A.rows_np, dev.B.rows_np + n, dev.C.rows_np + 2 * n]
    ).astype(np.int64)
    cols = np.concatenate([dev.A.cols_np, dev.B.cols_np, dev.C.cols_np])
    coeff = np.concatenate([dev.A.coeff_np, dev.B.coeff_np, dev.C.coeff_np])
    L = rows.shape[0]
    M = _MULACC_S * 128
    R = _MULACC_R
    K = -(-L // M)
    K = -(-K // R) * R
    Lp = M * K
    rows_pad = np.concatenate([rows, np.full(Lp - L, 3 * n, np.int64)])
    cols_pad = np.concatenate([cols, np.zeros(Lp - L, cols.dtype)])
    coeff_pad = np.concatenate(
        [coeff, np.zeros((Lp - L, nl), coeff.dtype)]
    )  # zero coeff -> zero product at padded records

    # flush after record j when the row changes or j is its lane's last
    nxt = np.concatenate([rows_pad[1:], np.asarray([-1], np.int64)])
    flush = rows_pad != nxt
    j = np.arange(Lp)
    flush |= (j % K) == (K - 1)

    pos = np.nonzero(flush)[0].astype(np.int32)
    seg = rows_pad[pos].astype(np.int32)  # ascending (rows sorted, lanes contiguous)
    # pad the flush set to a shape tier so same-size circuits share programs
    P = pos.shape[0]
    Pp = -(-P // 8192) * 8192
    pos = np.concatenate([pos, np.full(Pp - P, Lp - 1, np.int32)])
    seg = np.concatenate([seg, np.full(Pp - P, 3 * n, np.int32)])

    cw = (
        coeff_pad.reshape(_MULACC_S, 128, K, nl).transpose(2, 3, 0, 1)
    )  # (K, nl, S, 128)
    fl = (
        flush.astype(np.uint32)
        .reshape(_MULACC_S, 128, K)
        .transpose(2, 0, 1)
        .reshape(K // R, R, _MULACC_S, 128)
    )
    walk = MulaccWalk(
        cols=jnp.asarray(cols_pad.astype(np.int32)),
        coeff_walk=jnp.asarray(np.ascontiguousarray(cw)),
        flags_walk=jnp.asarray(np.ascontiguousarray(fl)),
        pos=jnp.asarray(pos),
        seg=jnp.asarray(seg),
        K=K,
        R=R,
        S=_MULACC_S,
        n_rows=3 * n,
    )
    dev._mulacc_walk = walk
    return walk
