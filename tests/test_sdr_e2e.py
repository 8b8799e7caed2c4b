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


def test_bladerf_fpga_autoload_e2e(tmp_path):
    """FPGA auto-detect + auto-load (input_bladerf.c:794-894): the fake
    device reports an unconfigured FPGA of size A9 (301); the module must
    pick hostedxA9.rbf from the search dir, load it, and stream."""
    fpga_dir = tmp_path / "fpga_store"
    fpga_dir.mkdir()
    (fpga_dir / "hostedxA9.rbf").write_bytes(b"\x00" * 64)
    loadlog = tmp_path / "fpga_loads.log"
    n = 1 << 17
    out = str(tmp_path / "out.raw")
    rc, so, se = sdr_e2e.run_bounded(
        "bladerf", n, out, cpu=True, timeout=540,
        env_extra={"FAKE_BLADERF_FPGA_CONFIGURED": "0",
                   "FAKE_BLADERF_FPGA_SIZE": "301",
                   "FAKE_BLADERF_FPGA_LOG": str(loadlog),
                   "IQTOOL_BLADERF_FPGA_DIR": str(fpga_dir)})
    assert rc == 0, se[-500:]
    loaded = loadlog.read_text().splitlines()
    assert loaded == [str(fpga_dir / "hostedxA9.rbf")]
    sdr_e2e.check_tone(out, snr_floor=55.0,
                       expected_frames=n * 11907 // 16384)


def test_bladerf_fpga_autoload_missing_file_errors(tmp_path):
    """No bitstream anywhere on the search path -> clear startup error
    naming the wanted file (input_bladerf.c:892-894), nonzero exit."""
    empty = tmp_path / "empty"
    empty.mkdir()
    out = str(tmp_path / "out.raw")
    rc, so, se = sdr_e2e.run_bounded(
        "bladerf", 1 << 16, out, cpu=True, timeout=540,
        env_extra={"FAKE_BLADERF_FPGA_CONFIGURED": "0",
                   "FAKE_BLADERF_FPGA_SIZE": "115",
                   "IQTOOL_BLADERF_FPGA_DIR": str(empty)})
    assert rc != 0
    assert "hostedx115.rbf" in (so + se)


def test_bladerf_fpga_size_mapping():
    """Size enum -> filename map and the unknown-size error
    (input_bladerf.c:806-815)."""
    import pytest as _pytest

    from iq_tool_tpu.modules.input_sdr import (bladerf_fpga_filename,
                                               bladerf_fpga_search_paths)
    assert bladerf_fpga_filename(40) == "hostedx40.rbf"
    assert bladerf_fpga_filename(115) == "hostedx115.rbf"
    assert bladerf_fpga_filename(49) == "hostedxA4.rbf"
    assert bladerf_fpga_filename(77) == "hostedxA5.rbf"
    assert bladerf_fpga_filename(301) == "hostedxA9.rbf"
    with _pytest.raises(ValueError, match="unknown or unsupported"):
        bladerf_fpga_filename(0)
    # default search order: exe dir, parent, system share dirs — all
    # ending in fpga/bladerf/<name> (input_bladerf.c:873-877)
    import os
    os.environ.pop("IQTOOL_BLADERF_FPGA_DIR", None)
    paths = bladerf_fpga_search_paths("hostedx40.rbf")
    assert len(paths) == 4
    assert all(p.endswith(os.path.join("fpga", "bladerf", "hostedx40.rbf"))
               for p in paths)
    assert any(p.startswith("/usr/local/share/") for p in paths)


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
