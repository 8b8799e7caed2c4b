"""Full-CLI rtlsdr end-to-end through a fake driver library (VERDICT
round-2 item 7): the REAL ctypes driver path — sync-read reader thread,
IQPK buffered framing, chain, raw sink — driven by an ABI-compatible
librtlsdr.so stand-in (native/fake_drivers/fake_librtlsdr.c), the local-
SDR counterpart of the protocol-faithful fake SpyServer
(input_rtlsdr.c:295-372 -> sdr_packet_serializer.c -> pipeline)."""

import shutil

import pytest

from tools import rtlsdr_e2e

N_FRAMES = 1 << 18


@pytest.mark.parametrize("buffered", [True, False],
                         ids=["iqpk-buffered", "realtime-ring"])
def test_rtlsdr_fake_driver_cli_e2e(tmp_path, buffered):
    if not (shutil.which("gcc") or shutil.which("cc")):
        pytest.skip("no C compiler in image")
    out = str(tmp_path / "out.raw")
    rc, so, se = rtlsdr_e2e.run_e2e(N_FRAMES, out, cpu=True,
                                    buffered=buffered, timeout=540)
    assert rc == 0, se[-500:]
    frames, expected, peak_hz, snr = rtlsdr_e2e.check_output(out, N_FRAMES)
    # exact rational frame accounting end to end
    assert frames == expected, (frames, expected)
    assert abs(peak_hz - rtlsdr_e2e.TONE_HZ) < 200, peak_hz
    # 8-bit cu8 source at 0.45 FS: ~48 dB quantization floor preserved
    assert snr > 45.0, snr
