"""I/Q imbalance: apply formula, estimator suppresses the mirror image."""

import numpy as np

from iq_tool_tpu.ops import iq_balance


def test_apply_formula(rng):
    x = (rng.standard_normal((2, 64)) + 1j * rng.standard_normal((2, 64))).astype(np.complex64)
    f = np.array([[0.01, -0.02], [0.0, 0.0]], np.float32)
    y = np.asarray(iq_balance.apply(x, f))
    want_i = x.real * (1 + f[:, 0:1])
    want_q = x.imag + f[:, 1:2] * x.real
    np.testing.assert_allclose(y.real, want_i, atol=1e-6)
    np.testing.assert_allclose(y.imag, want_q, atol=1e-6)


def _imbalance(x, gain_err, phase_err):
    """Simulate receiver imbalance (inverse-ish of the correction model)."""
    i = x.real * (1 + gain_err)
    q = x.imag + phase_err * x.real
    return (i + 1j * q).astype(np.complex64)


def _image_power_db(x, tone_bin):
    s = np.fft.fft(x * np.hamming(len(x)))
    p = np.abs(s) ** 2
    n = len(x)
    return 10 * np.log10(p[(-tone_bin) % n] / (p[tone_bin] + 1e-30))


def test_calibrate_suppresses_image(rng):
    n = 1024
    k = 200  # tone bin
    t = np.arange(n)
    x = np.exp(2j * np.pi * k * t / n).astype(np.complex64)
    rx = _imbalance(x, -0.002, 0.0015)  # imbalanced receiver
    before = _image_power_db(rx, k)
    factors = iq_balance.calibrate(rx[None, :], rounds=20)
    corrected = np.asarray(iq_balance.apply(rx[None, :], factors))[0]
    after = _image_power_db(corrected, k)
    assert after < before - 10.0, (before, after)


def test_maybe_update_gating(rng):
    """Weak noise-only signal must not move the factors (20 dB gate)."""
    x = (0.001 * (rng.standard_normal((1, 2048)) + 1j * rng.standard_normal((1, 2048)))).astype(np.complex64)
    st = iq_balance.init(1)
    st2 = iq_balance.maybe_update(x, st, interval_samples=1)
    np.testing.assert_array_equal(np.asarray(st2.factors), np.asarray(st.factors))


def test_maybe_update_rate_limit(rng):
    n = 1024
    t = np.arange(n)
    x = np.exp(2j * np.pi * 100 * t / n).astype(np.complex64)[None, :]
    rx = _imbalance(x, 0.003, -0.002)
    st = iq_balance.init(1)
    st = iq_balance.maybe_update(rx, st, interval_samples=10_000_000)
    first = np.asarray(st.factors).copy()
    assert np.any(first != 0)  # counter initialized saturated -> first fires
    # immediately after, the counter is 0 -> next update suppressed
    st2 = iq_balance.maybe_update(rx, st, interval_samples=10_000_000)
    np.testing.assert_array_equal(np.asarray(st2.factors), first)
