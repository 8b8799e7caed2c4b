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
