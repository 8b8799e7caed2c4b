"""DC blocker: matches the scalar IIR recurrence, removes DC, streams."""

import numpy as np

from iq_tool_tpu.ops import dc_block


def _scalar_ref(x, alpha):
    """Direct per-sample H(z) = (1 - z^-1)/(1 - (1-a) z^-1) (dc_block.c)."""
    a = 1.0 - alpha
    y = np.zeros_like(x)
    x_prev = 0.0 + 0.0j
    y_prev = 0.0 + 0.0j
    for i in range(len(x)):
        y[i] = x[i] - x_prev + a * y_prev
        x_prev = x[i]
        y_prev = y[i]
    return y


def test_matches_scalar_recurrence(rng):
    alpha = dc_block.alpha_for_rate(2_048_000.0)
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(np.complex64)
    got, _ = dc_block.apply(x[None, :], dc_block.init(1), alpha)
    want = _scalar_ref(x.astype(np.complex128), alpha)
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-4)


def test_removes_dc(rng):
    alpha = dc_block.alpha_for_rate(100_000.0)
    n = 65536
    x = (0.7 + 0.3j) * np.ones(n, np.complex64)
    x += 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    state = dc_block.init(1)
    y, state = dc_block.apply(x[None, :], state, alpha)
    tail = np.asarray(y)[0][-1000:]
    assert np.abs(tail.mean()) < 0.01  # DC gone (input DC was ~0.76)


def test_streaming_equals_batch(rng):
    alpha = dc_block.alpha_for_rate(48_000.0)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
    full, _ = dc_block.apply(x[None, :], dc_block.init(1), alpha)
    state = dc_block.init(1)
    parts = []
    for i in range(0, 4096, 1024):
        y, state = dc_block.apply(x[None, i:i + 1024], state, alpha)
        parts.append(np.asarray(y)[0])
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(full)[0],
                               rtol=0, atol=1e-5)


def test_reset():
    state = dc_block.DcState(
        np.ones(3).astype(np.complex64), np.ones(3).astype(np.complex64))
    r = dc_block.reset(state)
    assert np.all(np.asarray(r.x_prev) == 0) and np.all(np.asarray(r.y_prev) == 0)
