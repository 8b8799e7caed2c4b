"""End-to-end chain: composition correctness, reset semantics, shapes."""

import numpy as np
import pytest

from iq_tool_tpu.ops.fir_design import FilterRequest
from iq_tool_tpu.pipeline.chain import Chain, ChainConfig
from tests import ref_dsp


def _wire_tone(n, fs, freq, amp=0.5, fmt="cs16", start=0):
    t = (np.arange(start, start + n)) / fs
    x = amp * np.exp(2j * np.pi * freq * t)
    return ref_dsp.from_cf32(x.astype(np.complex64), fmt)


def test_nrsc5_slice_shapes():
    """BASELINE config #1: cs16 2.048 Msps -> 1.488375 Msps cs16."""
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0)
    ch = Chain(cfg)
    assert ch.n_in == 16384 and ch.n_out == 11907
    carry = ch.init_carry()
    raw = np.zeros((1, ch.in_wire_len), ch.in_wire_dtype)
    carry, out = ch.step(carry, raw, np.False_)
    assert out.shape == (1, ch.out_wire_len)
    assert out.dtype == ch.out_wire_dtype


def test_full_chain_tone_fidelity():
    """Config #2-like: shift + resample + lowpass; verify output tone."""
    fs_in, fs_out = 2_048_000.0, 1_488_375.0
    shift = 250_000.0
    cfg = ChainConfig(
        input_format="cs16", output_format="cs16",
        input_rate=fs_in, target_rate=fs_out,
        freq_shift_pre_hz=shift,
        filters=[FilterRequest("lowpass", 400_000.0)],
    )
    ch = Chain(cfg)
    assert ch.filter_stage == "post"   # downsampling, 400k < 744k Nyquist
    carry = ch.init_carry()
    f_tone = 100_000.0
    outs = []
    for b in range(4):
        raw = _wire_tone(ch.n_in, fs_in, f_tone, start=b * ch.n_in)[None, :]
        carry, out = ch.step(carry, raw, np.False_)
        outs.append(ref_dsp.to_cf32(np.asarray(out)[0], "cs16"))
    y = np.concatenate(outs)[ch.n_out:]
    # expected output tone at (f_tone + shift) at the output rate
    spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
    f_axis = np.fft.fftfreq(len(y), 1 / fs_out)
    peak_f = f_axis[np.argmax(spec)]   # SIGNED: catches conjugated NCO
    assert abs(peak_f - (f_tone + shift)) < fs_out / len(y) * 4
    # amplitude preserved within 0.5 dB
    amp = spec.max() / np.sum(np.hanning(len(y)))
    assert abs(20 * np.log10(amp / 0.5)) < 0.5


def test_chain_matches_manual_composition(rng):
    """The fused step == running the individual ops in sequence."""
    from iq_tool_tpu.ops import convert, dc_block, nco

    cfg = ChainConfig(input_format="cu8", output_format="cf32",
                      input_rate=1_000_000.0, target_rate=None,
                      dc_block=True, freq_shift_pre_hz=12_345.0,
                      target_block=4096)
    ch = Chain(cfg)
    raw = rng.integers(0, 256, (1, ch.in_wire_len), np.uint8)
    carry, out = ch.step(ch.init_carry(), raw, np.False_)

    x = convert.to_cf32(raw, "cu8", 1.0)
    x, _ = dc_block.apply(x, dc_block.init(1), ch.dc_alpha)
    x, _ = nco.apply(x, nco.init(1), ch.dtheta_pre)
    want = np.asarray(convert.from_cf32(x, "cf32"))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_reset_flag_resets_stream_state(rng):
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=1_000_000.0, target_rate=500_000.0,
                      dc_block=True, target_block=4096)
    ch = Chain(cfg)
    raw = rng.integers(-2 ** 15, 2 ** 15, (1, ch.in_wire_len), np.int16)
    # mid-stream state, then a step with vs without the reset flag
    c1, _ = ch.step(ch.init_carry(), raw, np.False_)
    _, out_reset = ch.step(c1, raw, np.True_)
    c1b, _ = ch.step(ch.init_carry(), raw, np.False_)   # rebuild (donated)
    _, out_cont = ch.step(c1b, raw, np.False_)
    # a reset step must behave exactly like a fresh stream ...
    _, out_fresh = ch.step(ch.init_carry(), raw, np.False_)
    np.testing.assert_array_equal(np.asarray(out_reset), np.asarray(out_fresh))
    # ... and genuinely differs from continuing the stream
    assert not np.array_equal(np.asarray(out_reset), np.asarray(out_cont))


def test_multichannel_batch(rng):
    cfg = ChainConfig(input_format="cs8", output_format="cs16",
                      input_rate=1_000_000.0, target_rate=750_000.0,
                      channels=4, target_block=4096)
    ch = Chain(cfg)
    raw = rng.integers(-128, 128, (4, ch.in_wire_len), np.int8)
    carry, out = ch.step(ch.init_carry(), raw, np.False_)
    assert out.shape == (4, ch.out_wire_len)
    # channels are independent: channel 0 result equals a 1-channel run
    ch1 = Chain(ChainConfig(input_format="cs8", output_format="cs16",
                            input_rate=1_000_000.0, target_rate=750_000.0,
                            channels=1, target_block=4096))
    _, out1 = ch1.step(ch1.init_carry(), raw[:1], np.False_)
    # different batch shapes may tile the banded matmuls differently, so
    # float accumulation order (and thus the rounded code) can differ by
    # one ulp on boundary values
    np.testing.assert_allclose(np.asarray(out)[0].astype(np.int32),
                               np.asarray(out1)[0].astype(np.int32), atol=1)


def test_filter_nyquist_error():
    with pytest.raises(ValueError, match="output rate"):
        Chain(ChainConfig(input_format="cs16", output_format="cs16",
                          input_rate=2_000_000.0, target_rate=200_000.0,
                          filters=[FilterRequest("lowpass", 300_000.0)],
                          filter_stage="auto"))


def test_shift_sanity_bound():
    with pytest.raises(ValueError, match="exceeds"):
        Chain(ChainConfig(input_format="cs16", output_format="cs16",
                          input_rate=100_000.0,
                          freq_shift_pre_hz=1_000_000.0))


def test_expected_out_frames():
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0)
    ch = Chain(cfg)
    assert ch.expected_out_frames(16384) == 11907
    assert ch.expected_out_frames(16384 * 3 + 1000) == (16384 * 3 + 1000) * 11907 // 16384


def test_filter_fusion_matches_sequential(rng):
    """Folding the FIR into the resampler stage == running them apart."""
    base = dict(input_format="cs16", output_format="cf32",
                input_rate=2_048_000.0, target_rate=1_488_375.0,
                freq_shift_pre_hz=100e3,
                filters=(FilterRequest("lowpass", 400e3),),
                filter_method="fir", target_block=8192)
    fused = Chain(ChainConfig(**base))
    plain = Chain(ChainConfig(**base, fuse_filters=False))
    assert fused.post_filter is None and plain.post_filter is not None
    raw = rng.integers(-2**15, 2**15, (1, fused.in_wire_len), np.int16)
    cf, cp = fused.init_carry(), plain.init_carry()
    for _ in range(3):
        cf, of = fused.step(cf, raw, np.False_)
        cp, op = plain.step(cp, raw, np.False_)
    np.testing.assert_allclose(np.asarray(of), np.asarray(op),
                               rtol=1e-4, atol=1e-4)


def test_prefilter_fusion_matches_sequential(rng):
    base = dict(input_format="cs16", output_format="cf32",
                input_rate=2_048_000.0, target_rate=1_536_000.0,
                filters=(FilterRequest("highpass", 600e3),),
                filter_method="fir", filter_stage="pre", target_block=8192)
    fused = Chain(ChainConfig(**base))
    plain = Chain(ChainConfig(**base, fuse_filters=False))
    assert fused.pre_filter is None and plain.pre_filter is not None
    raw = rng.integers(-2**15, 2**15, (1, fused.in_wire_len), np.int16)
    cf, cp = fused.init_carry(), plain.init_carry()
    for _ in range(3):
        cf, of = fused.step(cf, raw, np.False_)
        cp, op = plain.step(cp, raw, np.False_)
    np.testing.assert_allclose(np.asarray(of), np.asarray(op),
                               rtol=1e-4, atol=1e-4)
