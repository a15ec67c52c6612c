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
    return COOMatrix(jnp.asarray(r_arr), jnp.asarray(c_arr), co_mont, n_rows)


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
