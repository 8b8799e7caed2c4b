"""End-to-end runs of the BASELINE.json config list (SURVEY.md section 6)."""

import numpy as np

from iq_tool_tpu.cli import main
from tests import ref_dsp


def _tone_snr(y, f_out_norm, skip=8192):
    seg = y[skip:]
    m = np.arange(skip, len(y))
    ideal = np.exp(2j * np.pi * f_out_norm * m)
    a = np.vdot(ideal, seg) / np.vdot(ideal, ideal)
    resid = seg - a * ideal
    return (10 * np.log10(np.mean(np.abs(a * ideal) ** 2)
                          / (np.mean(np.abs(resid) ** 2) + 1e-30)), abs(a))


def test_config3_cu8_dc_bandpass_resample_cs16(tmp_path):
    """#3: cu8 capture -> DC block -> FFT band-pass -> resample -> cs16."""
    fs_in, fs_out = 2_400_000.0, 1_488_375.0
    f_tone = 300_000.0
    n = 19200 * 4
    t = np.arange(n) / fs_in
    x = (0.45 * np.exp(2j * np.pi * f_tone * t)).astype(np.complex64)
    x += 0.1  # DC offset the blocker must remove
    inp = tmp_path / "in.raw"
    inp.write_bytes(ref_dsp.from_cf32(x, "cu8").tobytes())
    outp = tmp_path / "out.raw"
    rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(outp),
               "--raw-file-input-rate", "2400000",
               "--raw-file-input-sample-format", "cu8",
               "--output-rate", "1488375",
               "--dc-block", "--filter-type", "fft",
               "--pass-range", "200e3:400e3",
               "--output-sample-format", "cs16"])
    assert rc == 0
    y = ref_dsp.to_cf32(np.frombuffer(outp.read_bytes(), np.int16), "cs16")
    snr, amp = _tone_snr(y, f_tone / fs_out)
    assert snr > 40.0, snr          # cu8 quantization limits the floor
    assert abs(amp - 0.45) < 0.05
    # DC is gone
    assert abs(np.mean(y[8192:])) < 0.01


def test_config4_full_chain(tmp_path):
    """#4: shift-before + iq-correction + notch + resample + shift-after + AGC."""
    fs_in = 2_048_000.0
    n = 16384 * 4
    t = np.arange(n) / fs_in
    # desired signal at +300 kHz, interferer at +500 kHz (to be notched)
    x = (0.3 * np.exp(2j * np.pi * 300e3 * t)
         + 0.3 * np.exp(2j * np.pi * 500e3 * t)).astype(np.complex64)
    inp = tmp_path / "in.raw"
    inp.write_bytes(ref_dsp.from_cf32(x, "cs16").tobytes())
    outp = tmp_path / "out.raw"
    rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(outp),
               "--raw-file-input-rate", "2048000",
               "--raw-file-input-sample-format", "cs16",
               "--output-rate", "1488375",
               "--dc-block", "--iq-correction",
               "--freq-shift", "-300e3",
               # filters see the post-shift spectrum (chain order:
               # shift -> filter, pre_processor.c:10-55): the 500 kHz
               # interferer sits at +200 kHz after the -300 kHz shift
               "--stopband", "150e3:250e3",
               "--output-agc", "--agc-profile", "digital",
               "--output-sample-format", "cs16"])
    assert rc == 0
    y = ref_dsp.to_cf32(np.frombuffer(outp.read_bytes(), np.int16), "cs16")
    fs_out = 1_488_375.0
    seg = y[len(y) // 2:]
    spec = np.abs(np.fft.fft(seg * np.hanning(len(seg))))
    freqs = np.fft.fftfreq(len(seg), 1 / fs_out)
    # desired tone moved to DC
    peak_f = freqs[np.argmax(spec)]
    assert abs(peak_f) < 2000.0, peak_f
    # interferer (would be at +200 kHz after shift) is notched
    mask = np.abs(freqs - 200e3) < 5e3
    main_pw = spec.max()
    interferer = spec[mask].max()
    assert 20 * np.log10(interferer / main_pw) < -40.0
    # digital AGC drove the peak toward its 0.9 target
    assert 0.5 < np.abs(seg).max() <= 1.0


def test_config1_accounting_exactness(tmp_path):
    """#1 frame accounting across many partial-block sizes."""
    for n in (16384, 16384 + 1, 16384 * 2 - 1, 5000):
        inp = tmp_path / f"in{n}.raw"
        t = np.arange(n) / 2_048_000.0
        x = (0.4 * np.exp(2j * np.pi * 1e5 * t)).astype(np.complex64)
        inp.write_bytes(ref_dsp.from_cf32(x, "cs16").tobytes())
        outp = tmp_path / f"out{n}.raw"
        rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(outp),
                   "--raw-file-input-rate", "2048000",
                   "--raw-file-input-sample-format", "cs16",
                   "--output-rate", "1488375"])
        assert rc == 0
        frames = len(outp.read_bytes()) // 4
        assert frames == n * 11907 // 16384, (n, frames)
