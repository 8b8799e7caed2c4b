"""Full-CLI fake-driver end-to-end for bladerf and hackrf (the rtlsdr
counterpart lives in test_rtlsdr_e2e.py): the REAL ctypes driver paths
driven by ABI-compatible vendor-library stand-ins
(native/fake_drivers/)."""

import shutil

import pytest

from tools import sdr_e2e

pytestmark = pytest.mark.skipif(
    not (shutil.which("gcc") or shutil.which("cc")),
    reason="no C compiler in image")


def test_bladerf_fake_driver_cli_e2e(tmp_path):
    """Sync-RX loop (sc16q11 12-bit), bounded stream -> EOS finalize:
    exact rational frame accounting + 12-bit quantization-floor SNR."""
    n = 1 << 19                    # multiple of the 16384-sample transfer
    out = str(tmp_path / "out.raw")
    rc, so, se = sdr_e2e.run_bounded("bladerf", n, out, cpu=True,
                                     timeout=540)
    assert rc == 0, se[-500:]
    frames, peak, snr = sdr_e2e.check_tone(
        out, snr_floor=55.0, expected_frames=n * 11907 // 16384)
    assert snr > 60.0, snr         # 12-bit source clears the 60 dB budget


def test_hackrf_fake_driver_cli_e2e(tmp_path):
    """libusb-async RX callbacks from a driver thread (cs8); the stream
    never ends on its own, so the run is bounded by SIGTERM — the
    graceful-interrupt finalize path (exit 130, partial summary)."""
    out = str(tmp_path / "out.raw")
    rc, so, se = sdr_e2e.run_sigterm("hackrf", out, min_bytes=1 << 21,
                                     cpu=True, timeout=540)
    assert rc == 130, (rc, se[-300:])
    sdr_e2e.check_tone(out, snr_floor=38.0)


def test_sdrplay_fake_driver_cli_e2e(tmp_path):
    """sdrplay_api 3.x service stand-in: the REAL 331-line ctypes binding
    driven end to end — planar short callbacks interleaved into the ring,
    a mid-stream reset propagated as a discontinuity (its filter-tail
    transient is expected), a power-overload detect/correct pair, and the
    DeviceRemoved clean-EOS path."""
    import os

    n = 1 << 19
    out = str(tmp_path / "out.raw")
    rc, so, se = sdr_e2e.run_bounded("sdrplay", n, out, cpu=True,
                                     timeout=540)
    assert rc == 0, se[-500:]
    expected = n * 11907 // 16384
    n_out = os.path.getsize(out) // 4
    assert expected - 2 <= n_out <= expected, (n_out, expected)
    # steady state on both sides of the reset transient
    sdr_e2e.check_tone(out, snr_floor=60.0,
                       span=(10000, n_out // 3 - 10000))
    sdr_e2e.check_tone(out, snr_floor=60.0, span=(2 * n_out // 3, None))
    # overload ack + reset + removal all logged through the real paths
    assert "overload" in se.lower(), se[-400:]
    assert "reset" in se.lower()
