"""NCO frequency shift: spectral behavior, streaming continuity, exact phase."""

import numpy as np

from iq_tool_tpu.ops import nco


def test_shift_moves_tone(rng):
    fs = 1_000_000.0
    f_tone = 100_000.0
    shift = 250_000.0
    n = 8192
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)[None, :]
    dtheta = nco.freq_to_dtheta(shift, fs)
    y, _ = nco.apply(x, nco.init(1), dtheta)
    spec = np.abs(np.fft.fft(np.asarray(y)[0]))
    peak_bin = np.argmax(spec)
    expect_bin = int(round((f_tone + shift) / fs * n))
    assert abs(peak_bin - expect_bin) <= 1


def test_negative_shift(rng):
    fs = 1_000_000.0
    n = 4096
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * 200_000.0 * t).astype(np.complex64)[None, :]
    y, _ = nco.apply(x, nco.init(1), nco.freq_to_dtheta(-150_000.0, fs))
    spec = np.abs(np.fft.fft(np.asarray(y)[0]))
    assert abs(np.argmax(spec) - int(round(50_000.0 / fs * n))) <= 1


def test_streaming_equals_batch(rng):
    """Phase continuity across block boundaries (frequency_shift.c carry)."""
    fs = 48000.0
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
    dtheta = nco.freq_to_dtheta(1234.5, fs)
    full, _ = nco.apply(x[None, :], nco.init(1), dtheta)
    acc = nco.init(1)
    parts = []
    for i in range(0, 4096, 512):
        y, acc = nco.apply(x[None, i:i + 512], acc, dtheta)
        parts.append(np.asarray(y)[0])
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(full)[0],
                               rtol=0, atol=1e-5)


def test_phase_accumulator_exact():
    """uint32 accumulator: no drift ever, exact mod-2^32 arithmetic."""
    dtheta = nco.freq_to_dtheta(0.3, 1.0)
    acc = nco.init(1)
    x = np.ones((1, 1000), np.complex64)
    for _ in range(7):
        _, acc = nco.apply(x, acc, dtheta)
    expect = (7 * 1000 * int(dtheta)) % (1 << 32)
    assert int(np.asarray(acc)[0]) == expect


def test_reset_zeroes_phase():
    acc = nco.init(2) + np.uint32(12345)
    assert np.all(np.asarray(nco.reset(acc)) == 0)
