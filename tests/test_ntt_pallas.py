"""Whole-transform Pallas NTT vs the stage-by-stage XLA core (bit-exact).

Runs in Pallas interpret mode on CPU at the smallest supported domain
(n = 1024, S = 8 sublanes); the hardware path is exercised by bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zokrates_tpu.kernels.ntt import domain_for_curve
from zokrates_tpu.kernels.ntt_pallas import fft_core_pallas


@pytest.fixture(scope="module")
def dom():
    return domain_for_curve("bn128", 1024)


@pytest.fixture(scope="module")
def sample(dom):
    rng = np.random.RandomState(7)
    vals = [int.from_bytes(rng.bytes(32), "little") % dom.p for _ in range(dom.n)]
    return dom.ops.encode(vals)


def test_forward_matches_xla(dom, sample):
    ref = np.asarray(jax.device_get(dom._fft_core(sample, dom._tw)))
    got = np.asarray(
        jax.device_get(fft_core_pallas(dom, sample, inverse=False, interpret=True))
    )
    assert np.array_equal(ref, got)


def test_inverse_matches_xla(dom, sample):
    ref = np.asarray(jax.device_get(dom._fft_core(sample, dom._tw_inv)))
    got = np.asarray(
        jax.device_get(fft_core_pallas(dom, sample, inverse=True, interpret=True))
    )
    assert np.array_equal(ref, got)


def test_batch_leading_dims(dom, sample):
    xb = jnp.stack([sample, sample[::-1]])
    ref = np.asarray(jax.device_get(dom._fft_core(xb, dom._tw)))
    got = np.asarray(
        jax.device_get(fft_core_pallas(dom, xb, inverse=False, interpret=True))
    )
    assert np.array_equal(ref, got)
