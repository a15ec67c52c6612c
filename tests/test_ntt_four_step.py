"""Single-device four-step NTT decomposition vs the direct XLA core.

Above the Pallas kernel's VMEM ceiling (n > 2^15) a transform decomposes
into two <= 2^15 sub-transforms + one twiddle multiply + transposes
(ntt.Domain._fft_four_step). Bit-exact against the direct stage core.
ZOKRATES_TPU_NTT is a trace-time knob, so the test drives the private
core entry points directly.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zokrates_tpu.kernels.ntt import domain_for_curve


@pytest.fixture(scope="module")
def dom():
    return domain_for_curve("bn128", 2048)


@pytest.fixture(scope="module")
def sample(dom):
    rng = np.random.RandomState(5)
    vals = [int.from_bytes(rng.bytes(32), "little") % dom.p for _ in range(dom.n)]
    return dom.ops.encode(vals)


def test_four_step_forward(dom, sample):
    ref = np.asarray(jax.device_get(dom._fft_core(sample, dom._tw)))
    got = np.asarray(jax.device_get(dom._fft_four_step(sample, inverse=False)))
    assert np.array_equal(ref, got)


def test_four_step_inverse(dom, sample):
    ref = np.asarray(jax.device_get(dom._fft_core(sample, dom._tw_inv)))
    got = np.asarray(jax.device_get(dom._fft_four_step(sample, inverse=True)))
    assert np.array_equal(ref, got)


def test_four_step_batch(dom, sample):
    xb = jnp.stack([sample, sample[::-1]])
    ref = np.asarray(jax.device_get(dom._fft_core(xb, dom._tw)))
    got = np.asarray(jax.device_get(dom._fft_four_step(xb, inverse=False)))
    assert np.array_equal(ref, got)
