"""End-to-end CLI: file -> file flows, presets, passthrough, wav container."""


import numpy as np
import pytest

from iq_tool_tpu.cli import main
from iq_tool_tpu.io.wav import WavReader, WavWriter
from tests import ref_dsp


def _write_raw_tone(path, n, fs, freq, fmt="cs16", amp=0.5):
    t = np.arange(n) / fs
    x = (amp * np.exp(2j * np.pi * freq * t)).astype(np.complex64)
    raw = ref_dsp.from_cf32(x, fmt)
    path.write_bytes(raw.tobytes())
    return x


def test_raw_to_raw_resample(tmp_path):
    """BASELINE config #1: cs16 raw 2.048M -> 1.488375M cs16 raw."""
    inp = tmp_path / "in.raw"
    outp = tmp_path / "out.raw"
    n = 16384 * 3 + 1000
    _write_raw_tone(inp, n, 2_048_000.0, 100_000.0)
    rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(outp),
               "--raw-file-input-rate", "2048000",
               "--raw-file-input-sample-format", "cs16",
               "--output-rate", "1488375"])
    assert rc == 0
    out = np.frombuffer(outp.read_bytes(), np.int16)
    frames = len(out) // 2
    assert frames == n * 11907 // 16384       # exact rational accounting
    y = ref_dsp.to_cf32(out, "cs16")
    # skip the startup transient, verify the tone
    seg = y[4096:]
    m = np.arange(4096, frames)
    ideal = np.exp(2j * np.pi * (100_000.0 / 1_488_375.0) * m)
    a = np.vdot(ideal, seg) / np.vdot(ideal, ideal)
    snr = 10 * np.log10(np.mean(np.abs(a * ideal) ** 2)
                        / np.mean(np.abs(seg - a * ideal) ** 2))
    assert snr > 55.0
    assert abs(abs(a) - 0.5) < 0.01


def test_raw_passthrough_byte_identity(tmp_path):
    inp = tmp_path / "in.raw"
    outp = tmp_path / "out.raw"
    payload = np.random.default_rng(0).integers(0, 256, 100_000, np.uint8).tobytes()
    inp.write_bytes(payload)
    rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(outp),
               "--raw-file-input-rate", "1000000",
               "--raw-file-input-sample-format", "cu8",
               "--raw-passthrough"])
    assert rc == 0
    assert outp.read_bytes() == payload


def test_preset_applies(tmp_path):
    inp = tmp_path / "in.raw"
    outp = tmp_path / "out.raw"
    _write_raw_tone(inp, 16384 * 2, 2_048_000.0, 50_000.0)
    rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(outp),
               "--raw-file-input-rate", "2048000",
               "--raw-file-input-sample-format", "cs16",
               "--preset", "cu8-nrsc5"])
    assert rc == 0
    # preset: cu8 output at 1488375 Hz
    out_frames = len(outp.read_bytes()) // 2   # cu8: 2 bytes/frame
    assert out_frames == 16384 * 2 * 11907 // 16384


def test_wav_roundtrip(tmp_path):
    wav_in = tmp_path / "t_20240101_000000Z_14236000Hz_iq.wav"
    n = 16384 * 2
    fs = 1_024_000
    t = np.arange(n) / fs
    x = (0.4 * np.exp(2j * np.pi * 50_000.0 * t)).astype(np.complex64)
    raw = ref_dsp.from_cf32(x, "cs16")
    with WavWriter(str(wav_in), fs, "cs16", container="wav") as w:
        w.write(raw.tobytes())
    out = tmp_path / "out.wav"
    rc = main(["-i", "wav", "-o", "wav", str(wav_in), str(out),
               "--output-rate", "512000"])
    assert rc == 0
    r = WavReader(str(out))
    assert r.info.sample_rate == 512000
    assert r.info.is_rf64            # wav output defaults to RF64 container
    assert r.info.frames == n // 2
    r.close()


def test_wav_center_target_freq(tmp_path):
    """Filename metadata drives the module NCO shift."""
    wav_in = tmp_path / "cap_20240101_000000Z_14236000Hz_iq.wav"
    fs = 1_024_000
    n = 16384
    # tone at +20 kHz relative to the 14.236 MHz center
    t = np.arange(n) / fs
    x = (0.4 * np.exp(2j * np.pi * 20_000.0 * t)).astype(np.complex64)
    with WavWriter(str(wav_in), fs, "cs16", container="wav") as w:
        w.write(ref_dsp.from_cf32(x, "cs16").tobytes())
    out = tmp_path / "out.raw"
    # ask for 14.256 MHz at DC: shift = 14236000 - 14256000 = -20 kHz
    rc = main(["-i", "wav", "-o", "raw", str(wav_in), str(out),
               "--wav-center-target-freq", "14256000", "--no-resample",
               "--output-sample-format", "cs16"])
    assert rc == 0
    y = ref_dsp.to_cf32(np.frombuffer(out.read_bytes(), np.int16), "cs16")
    # the tone moved from +20 kHz to DC
    spec = np.abs(np.fft.fft(y[:8192]))
    assert np.argmax(spec) == 0


def test_missing_rate_error(tmp_path):
    inp = tmp_path / "in.raw"
    inp.write_bytes(b"\x00" * 1000)
    rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(tmp_path / "o"),
               "--raw-file-input-rate", "1000000",
               "--raw-file-input-sample-format", "cs16"])
    assert rc == 1


def test_overwrite_protection(tmp_path):
    inp = tmp_path / "in.raw"
    outp = tmp_path / "out.raw"
    _write_raw_tone(inp, 16384, 1_000_000.0, 1000.0)
    outp.write_bytes(b"existing")
    argv = ["-i", "raw-file", "-o", "raw", str(inp), str(outp),
            "--raw-file-input-rate", "1000000",
            "--raw-file-input-sample-format", "cs16", "--no-resample"]
    assert main(argv) == 1                      # refuses without the flag
    assert outp.read_bytes() == b"existing"
    assert main(argv + ["--force-overwrite"]) == 0


def test_list_presets(capsys):
    assert main(["--list-presets", "-i", "wav", "-o", "raw"]) == 0
    out = capsys.readouterr().out
    assert "cu8-nrsc5" in out and "cs16-am-nrsc5" in out


def test_stopband_filter_end_to_end(tmp_path):
    """Off-center notch (our fixed stop-range) removes the tone."""
    inp = tmp_path / "in.raw"
    outp = tmp_path / "out.raw"
    n = 16384 * 2
    _write_raw_tone(inp, n, 1_000_000.0, 100_000.0)
    rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(outp),
               "--raw-file-input-rate", "1000000",
               "--raw-file-input-sample-format", "cs16",
               "--no-resample", "--stopband", "80e3:120e3"])
    assert rc == 0
    y = ref_dsp.to_cf32(np.frombuffer(outp.read_bytes(), np.int16), "cs16")
    power = np.mean(np.abs(y[8192:]) ** 2)
    assert 10 * np.log10(power + 1e-30) < -50.0   # tone (0.125 power) notched


@pytest.mark.parametrize("cut_frames", [16384 * 2, 16384 * 2 - 1003])
def test_checkpoint_resume_cli(tmp_path, cut_frames):
    """Interrupted job resumed via --checkpoint/--resume produces the same
    bytes as an uninterrupted run.  The non-block-aligned cut covers the
    EOS partial-block case: the final checkpoint must record the cut
    BEFORE the zero-padded tail block (whose carry saw padding), or the
    resumed stream diverges."""
    inp = tmp_path / "in.raw"
    n = 16384 * 4
    _write_raw_tone(inp, n, 2_048_000.0, 80_000.0)
    base_args = ["-i", "raw-file", "-o", "raw",
                 "--raw-file-input-rate", "2048000",
                 "--raw-file-input-sample-format", "cs16",
                 "--output-rate", "1488375",
                 "--dc-block", "--freq-shift", "30e3",
                 "--lowpass", "400e3"]

    full = tmp_path / "full.raw"
    assert main(base_args + [str(inp), str(full)]) == 0

    # simulate an interrupted first run: process only part of the input
    half_in = tmp_path / "half.raw"
    half_in.write_bytes(inp.read_bytes()[: cut_frames * 4])
    part = tmp_path / "part.raw"
    ckpt = tmp_path / "state.ckpt"
    assert main(base_args + [str(half_in), str(part),
                             "--checkpoint", str(ckpt)]) == 0
    assert ckpt.exists()

    # resume against the full input; output continues sample-exact
    assert main(base_args + [str(inp), str(part),
                             "--checkpoint", str(ckpt), "--resume"]) == 0
    assert part.read_bytes() == full.read_bytes()


@pytest.mark.parametrize("fmt", ["cu8", "cs8", "cs16", "cu16", "sc16q11",
                                 "cs24", "cs32", "cu32", "cf32"])
def test_all_wire_formats_end_to_end(tmp_path, fmt):
    """Every complex wire format flows through the full pipeline (in and out)."""
    n = 16384
    t = np.arange(n) / 1_000_000.0
    x = (0.4 * np.exp(2j * np.pi * 50_000.0 * t)).astype(np.complex64)
    inp = tmp_path / "in.raw"
    inp.write_bytes(ref_dsp.from_cf32(x, fmt).tobytes())
    outp = tmp_path / "out.raw"
    rc = main(["-i", "raw-file", "-o", "raw", str(inp), str(outp),
               "--raw-file-input-rate", "1000000",
               "--raw-file-input-sample-format", fmt,
               "--output-rate", "500000",
               "--output-sample-format", fmt])
    assert rc == 0
    from iq_tool_tpu.formats import get_format
    f = get_format(fmt)
    assert len(outp.read_bytes()) == (n // 2) * f.bytes_per_frame
    wire = np.frombuffer(outp.read_bytes(),
                         np.uint8 if f.wire_dtype is None else f.wire_dtype)
    y = ref_dsp.to_cf32(wire, fmt)
    m = np.arange(2048, len(y))
    ideal = np.exp(2j * np.pi * 0.1 * m)
    a = np.vdot(ideal, y[2048:]) / np.vdot(ideal, ideal)
    assert abs(abs(a) - 0.4) < 0.02


def test_checkpoint_resume_wav_output(tmp_path):
    """Resume works with a WAV (RF64) output: header adopted, data appended."""
    inp = tmp_path / "in.wav"
    n = 16384 * 4
    fs = 2_048_000
    t = np.arange(n) / fs
    x = (0.4 * np.exp(2j * np.pi * 90_000.0 * t)).astype(np.complex64)
    payload = ref_dsp.from_cf32(x, "cs16").tobytes()
    with WavWriter(str(inp), fs, "cs16", container="wav") as w:
        w.write(payload)
    base = ["-i", "wav", "-o", "wav", "--output-rate", "1488375"]

    full = tmp_path / "full.wav"
    assert main(base + [str(inp), str(full)]) == 0

    half = tmp_path / "half.wav"
    with WavWriter(str(half), fs, "cs16", container="wav") as w:
        w.write(payload[: len(payload) // 2])
    part = tmp_path / "part.wav"
    ck = tmp_path / "c.ckpt"
    assert main(base + [str(half), str(part), "--checkpoint", str(ck)]) == 0
    assert main(base + [str(inp), str(part), "--checkpoint", str(ck),
                        "--resume"]) == 0
    rf, rp = WavReader(str(full)), WavReader(str(part))
    assert rf.info.frames == rp.info.frames
    assert rf.read_frames(rf.info.frames) == rp.read_frames(rp.info.frames)
    rf.close(); rp.close()


def test_preset_name_as_flag_errors_helpfully(tmp_path, monkeypatch, capsys):
    """cli.c:38-45: '--cu8-nrsc5' must explain presets, not just 'unrecognized'."""
    from iq_tool_tpu import cli
    with pytest.raises(SystemExit):
        cli.main(["-i", "raw-file", "-o", "raw", "--cu8-nrsc5"])
    err = capsys.readouterr().err
    assert "--preset cu8-nrsc5" in err


def test_negative_range_values_merge():
    from iq_tool_tpu.cli import _fix_negative_numbers
    out = _fix_negative_numbers(
        ["--freq-shift", "-50e3", "--stopband-2", "-5e3:5e3", "--lowpass", "1e5"])
    assert out == ["--freq-shift=-50e3", "--stopband-2=-5e3:5e3",
                   "--lowpass", "1e5"]


def test_crash_resume_truncates_stale_output(tmp_path):
    """Output written AFTER the last checkpoint (crash window) must be
    truncated on resume, not duplicated."""
    inp = tmp_path / "in.raw"
    n = 16384 * 4
    _write_raw_tone(inp, n, 2_048_000.0, 80_000.0)
    base_args = ["-i", "raw-file", "-o", "raw",
                 "--raw-file-input-rate", "2048000",
                 "--raw-file-input-sample-format", "cs16",
                 "--output-rate", "1488375"]

    full = tmp_path / "full.raw"
    assert main(base_args + [str(inp), str(full)]) == 0

    half_in = tmp_path / "half.raw"
    half_in.write_bytes(inp.read_bytes()[: n // 2 * 4])
    part = tmp_path / "part.raw"
    ckpt = tmp_path / "state.ckpt"
    assert main(base_args + [str(half_in), str(part),
                             "--checkpoint", str(ckpt)]) == 0

    # simulate a crash AFTER the checkpoint: extra junk already in the file
    with open(part, "ab") as f:
        f.write(b"\x55\xaa" * 2048)

    assert main(base_args + [str(inp), str(part),
                             "--checkpoint", str(ckpt), "--resume"]) == 0
    assert part.read_bytes() == full.read_bytes()
