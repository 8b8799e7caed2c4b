"""Matmul FFT vs numpy (the TPU backend has no FFT custom call)."""

import numpy as np
import pytest

from iq_tool_tpu.ops import fft as tfft


@pytest.mark.parametrize("n", [8, 64, 256, 1024, 4096, 32768])
def test_fft_matches_numpy(rng, n):
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(tfft.fft(x))
    want = np.fft.fft(x)
    scale = np.max(np.abs(want)) + 1e-30
    assert np.max(np.abs(got - want)) / scale < 2e-5


def test_fft_batched(rng):
    x = (rng.standard_normal((3, 5, 512)) + 1j * rng.standard_normal((3, 5, 512))).astype(np.complex64)
    got = np.asarray(tfft.fft(x))
    want = np.fft.fft(x, axis=-1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-5


def test_ifft_roundtrip(rng):
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(np.complex64)
    got = np.asarray(tfft.ifft(tfft.fft(x)))
    assert np.max(np.abs(got - x)) < 1e-4


def test_fftshift(rng):
    x = rng.standard_normal(16).astype(np.complex64)
    np.testing.assert_array_equal(np.asarray(tfft.fftshift(x)), np.fft.fftshift(x))


def test_non_pow2_rejected():
    with pytest.raises(ValueError):
        tfft.fft(np.zeros(12, np.complex64))
