"""Radix-2 number-theoretic transform over prime scalar fields, on device.

Used by QAP instance/witness reduction in Groth16/GM17 (reference: arkworks
ark-poly Radix2EvaluationDomain with rayon-parallel butterflies) and by
Marlin's polynomial arithmetic.

Design: iterative Cooley-Tukey, decimation-in-time after a bit-reversal
permutation. Each of the log2(n) stages is one batched butterfly over the
whole (n, nl) limb array — twiddle factors are precomputed per stage on the
host (Montgomery form) and looked up by broadcast, so a stage is exactly one
field mul + add/sub over n/2 lanes. The sequential depth is log2(n); all the
work inside a stage is data-parallel (shard over the domain axis; the stage
exchange pattern is the all-to-all of classic distributed FFT).

Domains are the standard 2-adic subgroups: w = two_adic_root^(2^(s - k)).
Supports coset evaluation (multiply by coset powers pre/post) for the
Groth16 h(X) computation on a coset of the vanishing domain.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import params as P
from ..fields.jfield import field_ops
from ..fields.limbs import LIMB_BITS, ints_to_limbs


class Domain:
    """Radix-2 evaluation domain of size n = 2^k over field p."""

    def __init__(self, p: int, n: int, two_adic_root: int, two_adicity: int):
        assert n & (n - 1) == 0, "domain size must be a power of two"
        k = n.bit_length() - 1
        assert k <= two_adicity, f"field has no 2^{k} roots of unity"
        self.p = p
        self.n = n
        self.k = k
        self.ops = field_ops(p)
        self.omega = pow(two_adic_root, 1 << (two_adicity - k), p)
        self.omega_inv = pow(self.omega, -1, p)
        self.omega_w_root = (two_adic_root, two_adicity)  # for sub-domains
        self.n_inv = pow(n, -1, p)

        # stage twiddles, Montgomery form: stage s uses w_m = omega^(n/m),
        # m = 2^(s+1); twiddle vector = [w_m^0 .. w_m^(m/2-1)] tiled.
        self._tw = self._make_twiddles(self.omega)
        self._tw_inv = self._make_twiddles(self.omega_inv)

        # bit-reversal permutation (vectorized)
        idx = np.arange(n, dtype=np.int64)
        rev = np.zeros(n, dtype=np.int64)
        for b in range(self.k):
            rev = (rev << 1) | ((idx >> b) & 1)
        self.bitrev = rev.astype(np.int32)  # numpy: trace-safe if built mid-trace

        rr = pow(2, LIMB_BITS * self.ops.nl, self.p)
        self.n_inv_mont = np.asarray(
            ints_to_limbs([self.n_inv * rr % self.p], self.ops.nl)
        )[0]
        self.fft_jit = jax.jit(self.fft)
        self.ifft_jit = jax.jit(self.ifft)
        self.coset_fft_jit = jax.jit(self.coset_fft, static_argnums=1)
        self.coset_ifft_jit = jax.jit(self.coset_ifft, static_argnums=1)

    def _make_twiddles(self, omega: int):
        # host-computed Montgomery limbs (NOT ops.encode, a jitted device
        # call): Domains are sometimes constructed lazily inside a jit
        # trace (_four_step_parts), where device ops would return tracers
        # and poison the twiddle cache — see _coset_powers below.
        rr = pow(2, LIMB_BITS * self.ops.nl, self.p)
        tws = []
        for s in range(self.k):
            m = 1 << (s + 1)
            w_m = pow(omega, self.n // m, self.p)
            powers = []
            acc = 1
            for _ in range(m // 2):
                powers.append(acc * rr % self.p)
                acc = acc * w_m % self.p
            # numpy on purpose: jnp.asarray stages under a jit trace and
            # would cache tracers when a Domain is built lazily mid-trace
            tws.append(np.asarray(ints_to_limbs(powers, self.ops.nl)))
        return tws

    # -- transforms --------------------------------------------------------
    def _use_pallas(self) -> bool:
        """Whole-transform Pallas kernel (ntt_pallas.py) on TPU for domains
        >= 1024 (the (S, 128) layout needs S >= 8); ZOKRATES_TPU_NTT=xla
        forces the stage-by-stage XLA path (cross-check knob)."""
        import os

        mode = os.environ.get("ZOKRATES_TPU_NTT", "auto")
        if mode == "xla":
            return False
        if mode == "pallas":
            return True
        # upper bound: the kernel keeps the whole (nl, n/128, 128) array
        # in VMEM — at n = 2^15 / nl = 16 that is 2 MB of state (~10 MB
        # with twiddles + mul temporaries); n = 2^17+ would blow the
        # ~16 MB scoped-vmem budget. Larger domains stay on the XLA path
        # (or a four-step decomposition over this kernel).
        return 1024 <= self.n <= (1 << 15) and jax.default_backend() == "tpu"

    def _use_four_step(self) -> bool:
        """Domains above the Pallas kernel's VMEM ceiling decompose into
        two <= 2^15 sub-transforms (plus one twiddle multiply and three
        transposes) so the whole-transform kernel still carries the work.
        TPU-only by default; ZOKRATES_TPU_NTT=four_step forces it (test
        knob), =xla disables."""
        import os

        mode = os.environ.get("ZOKRATES_TPU_NTT", "auto")
        if mode == "four_step":
            return self.n > (1 << 10)
        if mode != "auto":
            return False
        return self.n > (1 << 15) and jax.default_backend() == "tpu"

    @lru_cache(maxsize=None)
    def _four_step_parts(self, inverse: bool):
        """(dom1, dom2, TW) for n = n1 * n2 with balanced halves.

        Derivation (i = i1 + n1*i2, k = k2 + n2*k1, w the n-th root):
          X[k2 + n2 k1] = FFT_n1( w^(i1 k2) * FFT_n2(x[i1 + n1 i2]) )
        so: reshape -> n2-transforms (root w^n1 = dom2.omega), twiddle by
        w^(i1 k2), n1-transforms (root w^n2 = dom1.omega), transpose."""
        k1 = self.k // 2
        n1 = 1 << k1
        n2 = self.n // n1
        dom1 = Domain(self.p, n1, self.omega_w_root[0], self.omega_w_root[1])
        dom2 = Domain(self.p, n2, self.omega_w_root[0], self.omega_w_root[1])
        w = self.omega_inv if inverse else self.omega
        rr = pow(2, LIMB_BITS * self.ops.nl, self.p)
        rows = []
        for i1 in range(n1):
            base = pow(w, i1, self.p)
            acc = 1
            row = []
            for _ in range(n2):
                row.append(acc * rr % self.p)
                acc = acc * base % self.p
            rows.extend(row)
        tw = np.asarray(ints_to_limbs(rows, self.ops.nl)).reshape(
            n1, n2, -1
        )  # numpy: _four_step_parts is lru_cached and may populate mid-trace
        return dom1, dom2, tw

    def _fft_four_step(self, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        f = self.ops
        n, nl = x.shape[-2], x.shape[-1]
        lead = x.shape[:-2]
        dom1, dom2, tw = self._four_step_parts(inverse)
        n1, n2 = dom1.n, dom2.n
        xb = x.reshape((-1, n2, n1, nl))          # [b][i2][i1]
        xt = xb.transpose(0, 2, 1, 3)             # [b][i1][i2]
        B = dom2._fft_core(xt, dom2._tw_inv if inverse else dom2._tw)
        B = f.mul_(B, tw[None])                   # w^(i1 k2)
        Bt = B.transpose(0, 2, 1, 3)              # [b][k2][i1]
        Ct = dom1._fft_core(Bt, dom1._tw_inv if inverse else dom1._tw)
        out = Ct.transpose(0, 2, 1, 3).reshape(lead + (n, nl))
        return out

    def _fft_core(self, x: jnp.ndarray, twiddles) -> jnp.ndarray:
        """x: (..., n, nl) Montgomery limbs -> transformed, natural order."""
        if self._use_four_step():
            return self._fft_four_step(x, inverse=twiddles is self._tw_inv)
        if self._use_pallas():
            from .ntt_pallas import fft_core_pallas

            return fft_core_pallas(self, x, inverse=twiddles is self._tw_inv)
        f = self.ops
        n = self.n
        lead = x.shape[:-2]
        x = jnp.take(x, self.bitrev, axis=-2)
        for s in range(self.k):
            m = 1 << (s + 1)
            half = m // 2
            xv = x.reshape(lead + (n // m, m, -1))
            even = xv[..., :half, :]
            odd = xv[..., half:, :]
            t = f.mul_(odd, twiddles[s])  # broadcast (half, nl)
            x = jnp.concatenate([f.add_(even, t), f.sub_(even, t)], axis=-2)
            x = x.reshape(lead + (n, -1))
        return x

    def _mul_table(self, x: jnp.ndarray, rows: np.ndarray) -> jnp.ndarray:
        """Elementwise multiply of (..., n, nl) by a shared (n, nl) table.
        On TPU this runs as one Pallas kernel (kernels/pallas_field.emul)
        — the XLA scan-CIOS costs ~2 ms per 10^6 elements of HBM-streamed
        carry tensor; the kernel reads each operand once."""
        if jax.default_backend() == "tpu":
            from .pallas_field import emul

            lead = x.shape[:-2]
            B = 1
            for d in lead:
                B *= d
            out = emul(self.p, x.reshape(B, self.n, -1), jnp.asarray(rows))
            return out.reshape(x.shape)
        return self.ops.mul_(x, rows)

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Coefficients -> evaluations on the domain (both Montgomery limbs)."""
        return self._fft_core(coeffs, self._tw)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        """Evaluations -> coefficients."""
        x = self._fft_core(evals, self._tw_inv)
        return self._mul_table(
            x, np.broadcast_to(self.n_inv_mont, (self.n, len(self.n_inv_mont)))
        )

    # -- coset transforms (for h(X) = (AB - C)/Z on a coset) ---------------
    @lru_cache(maxsize=None)
    def _coset_powers(self, g: int):
        """Montgomery limb table of [g^0 .. g^(n-1)], computed ENTIRELY on
        the host: the cached value is always a concrete array, so hitting
        (or repopulating) this cache inside a jit trace is safe. An
        earlier version encoded via device ops with a 4-entry cache —
        eviction repopulated it mid-trace and cached a tracer, poisoning
        later traces (UnexpectedTracerError in unrelated proves)."""
        rr = pow(2, LIMB_BITS * self.ops.nl, self.p)  # Montgomery factor
        powers, acc = [], 1
        for _ in range(self.n):
            powers.append(acc * rr % self.p)
            acc = acc * g % self.p
        return np.asarray(ints_to_limbs(powers, self.ops.nl))

    @lru_cache(maxsize=None)
    def _coset_powers_inv(self, g: int):
        return self._coset_powers(pow(g, -1, self.p))

    def warm_coset(self, g: int):
        """Pre-populate the coset-power caches (now merely an optimization
        — the tables are host-computed and trace-safe either way)."""
        self._coset_powers(g)
        self._coset_powers_inv(g)

    def coset_fft(self, coeffs: jnp.ndarray, g: int) -> jnp.ndarray:
        """Evaluate on the coset g * <omega>."""
        scaled = self._mul_table(coeffs, self._coset_powers(g))
        return self.fft(scaled)

    def coset_ifft(self, evals: jnp.ndarray, g: int) -> jnp.ndarray:
        coeffs = self.ifft(evals)
        return self._mul_table(coeffs, self._coset_powers_inv(g))

    # -- host helpers ------------------------------------------------------
    def fft_ints(self, xs):
        a = self.ops.encode(list(xs) + [0] * (self.n - len(xs)))
        return self.ops.decode(self.fft_jit(a))

    def ifft_ints(self, xs):
        a = self.ops.encode(list(xs))
        return self.ops.decode(self.ifft_jit(a))


@lru_cache(maxsize=None)
def domain_for_curve(curve: str, n: int) -> Domain:
    fp = P.SCALAR_FIELDS[curve]
    return Domain(fp.p, n, fp.two_adic_root, fp.two_adicity)
