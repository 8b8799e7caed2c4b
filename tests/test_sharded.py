"""Time/channel-sharded chain vs the single-device chain (8 CPU devices)."""

import jax
import numpy as np
import pytest

from iq_tool_tpu.ops.fir_design import FilterRequest
from iq_tool_tpu.parallel import ShardedChain, make_mesh
from iq_tool_tpu.pipeline.chain import Chain, ChainConfig
from tests import ref_dsp

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _full_cfg(channels=1, block=2048):
    return ChainConfig(
        input_format="cs16", output_format="cs16",
        input_rate=2_048_000.0, target_rate=1_488_375.0,
        channels=channels,
        dc_block=True,
        freq_shift_pre_hz=150_000.0,
        freq_shift_post_hz=-25_000.0,
        filters=[FilterRequest("lowpass", 400_000.0)],
        agc_profile="local",
        target_block=block,
    )


def _run_blocks(step_fn, init_carry, raws, reset_idx=None):
    carry = init_carry
    outs = []
    for i, raw in enumerate(raws):
        reset = np.bool_(reset_idx == i)
        carry, out = step_fn(carry, raw, reset)
        outs.append(np.asarray(jax.device_get(out)))
    return np.concatenate(outs, axis=-1)


def _make_raws(n_blocks, shape_frames, rng, items=2):
    return [rng.integers(-2 ** 14, 2 ** 14,
                         (1, shape_frames * items)).astype(np.int16)
            for _ in range(n_blocks)]


def test_time_sharded_matches_single(rng):
    mesh = make_mesh(jax.devices(), channel_shards=1, time_shards=8)
    cfg = _full_cfg(block=2048)
    sc = ShardedChain(cfg, mesh)
    single = Chain(ChainConfig(**{**cfg.__dict__,
                                  "target_block": sc.local.cfg.target_block}))
    # single chain at the per-shard block size: 8 single blocks == 1 sharded
    assert sc.n_in == 8 * single.n_in

    raws = _make_raws(2, sc.n_in, rng)
    got = _run_blocks(sc.step, sc.init_carry(), raws)

    carry = single.init_carry()
    outs = []
    for raw in raws:
        for j in range(8):
            sub = raw[:, j * single.n_in * 2:(j + 1) * single.n_in * 2]
            carry, out = single.step(carry, sub, np.False_)
            outs.append(np.asarray(jax.device_get(out)))
    want = np.concatenate(outs, axis=-1)

    # Quantized int16 outputs. Without the DC blocker the match is exact
    # (test_sharded_without_dc_is_exact); the DC IIR (10 Hz cutoff -> 32k
    # sample time constant, condition ~1/alpha = 3e4) legitimately amplifies
    # few-ulp f32 association differences to a few codes that then thread
    # through the AGC gain loop.  Compare at the SNR level (chain contract
    # is 60 dB) plus a hard cap on any single code.
    diff = got.astype(np.float64) - want.astype(np.float64)
    snr = 10 * np.log10((want.astype(np.float64) ** 2).mean()
                        / (diff ** 2).mean())
    assert snr > 60.0, snr
    assert np.abs(diff).max() <= 32


def test_channel_sharded_matches_single(rng):
    mesh = make_mesh(jax.devices(), channel_shards=4, time_shards=2)
    cfg = _full_cfg(channels=4, block=2048)
    sc = ShardedChain(cfg, mesh)
    raws = [rng.integers(-2 ** 14, 2 ** 14, (4, sc.n_in * 2)).astype(np.int16)
            for _ in range(2)]
    got = _run_blocks(sc.step, sc.init_carry(), raws)

    single = Chain(ChainConfig(**{**cfg.__dict__, "channels": 1,
                                  "target_block": sc.local.cfg.target_block}))
    for ch in range(0, 4, 3):   # spot-check first and last channel
        carry = single.init_carry()
        outs = []
        for raw in raws:
            for j in range(2):
                sub = raw[ch:ch + 1, j * single.n_in * 2:(j + 1) * single.n_in * 2]
                carry, out = single.step(carry, sub, np.False_)
                outs.append(np.asarray(jax.device_get(out)))
        want = np.concatenate(outs, axis=-1)[0]
        diff = got[ch].astype(np.float64) - want.astype(np.float64)
        snr = 10 * np.log10((want.astype(np.float64) ** 2).mean()
                            / ((diff ** 2).mean() + 1e-30))
        assert snr > 60.0, snr


def test_sharded_reset(rng):
    mesh = make_mesh(jax.devices(), channel_shards=1, time_shards=8)
    cfg = _full_cfg(block=2048)
    sc = ShardedChain(cfg, mesh)
    raws = _make_raws(2, sc.n_in, rng)
    carry = sc.init_carry()
    carry, _ = sc.step(carry, raws[0], np.False_)
    _, out_reset = sc.step(carry, raws[1], np.True_)
    _, out_fresh = sc.step(sc.init_carry(), raws[1], np.False_)
    np.testing.assert_array_equal(np.asarray(jax.device_get(out_reset)),
                                  np.asarray(jax.device_get(out_fresh)))


def test_sharded_tone_quality():
    """A tone through the full sharded chain keeps its fidelity."""
    mesh = make_mesh(jax.devices(), channel_shards=1, time_shards=8)
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      target_block=2048)
    sc = ShardedChain(cfg, mesh)
    carry = sc.init_carry()
    outs = []
    for b in range(3):
        t = np.arange(b * sc.n_in, (b + 1) * sc.n_in) / 2_048_000.0
        x = (0.5 * np.exp(2j * np.pi * 100_000.0 * t)).astype(np.complex64)
        raw = ref_dsp.from_cf32(x, "cs16")[None, :]
        carry, out = sc.step(carry, raw, np.False_)
        outs.append(np.asarray(jax.device_get(out))[0])
    y = ref_dsp.to_cf32(np.concatenate(outs), "cs16")[sc.n_out:]
    m = np.arange(sc.n_out, 3 * sc.n_out)
    ideal = np.exp(2j * np.pi * (100_000.0 / 1_488_375.0) * m)
    a = np.vdot(ideal, y) / np.vdot(ideal, ideal)
    snr = 10 * np.log10(np.mean(np.abs(a * ideal) ** 2)
                        / np.mean(np.abs(y - a * ideal) ** 2))
    assert snr > 55.0
    assert abs(abs(a) - 0.5) < 0.01


def test_sharded_without_dc_is_exact(rng):
    """Everything except the DC IIR matches the single-device chain
    bit-for-bit after quantization."""
    mesh = make_mesh(jax.devices(), channel_shards=1, time_shards=8)
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      freq_shift_pre_hz=150_000.0,
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      agc_profile="local", target_block=2048)
    sc = ShardedChain(cfg, mesh)
    single = Chain(ChainConfig(**{**cfg.__dict__,
                                  "target_block": sc.local.cfg.target_block}))
    raws = _make_raws(2, sc.n_in, rng)
    got = _run_blocks(sc.step, sc.init_carry(), raws)
    carry = single.init_carry()
    outs = []
    for raw in raws:
        for j in range(8):
            sub = raw[:, j * single.n_in * 2:(j + 1) * single.n_in * 2]
            carry, out = single.step(carry, sub, np.False_)
            outs.append(np.asarray(jax.device_get(out)))
    want = np.concatenate(outs, axis=-1)
    np.testing.assert_array_equal(got, want)


def test_sharded_fused_pre_stage_interpret(rng, monkeypatch):
    """The fused Pallas pre-stage on the sharded path (zero-start kernel
    + linear prefix correction), in interpret mode on the CPU mesh,
    against the plain single-device chain.  Real-Mosaic execution of the
    same path is covered on hardware by tools/tpu_smoke.py."""
    from iq_tool_tpu.parallel import sharded as sharded_mod
    monkeypatch.setattr(sharded_mod, "_FUSED_INTERPRET", True)
    mesh = make_mesh(jax.devices()[:4], channel_shards=1, time_shards=4)
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      dc_block=True, iq_correction=True,
                      freq_shift_pre_hz=150_000.0,
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      target_block=2048)
    sc = ShardedChain(cfg, mesh)
    single = Chain(ChainConfig(**{**cfg.__dict__,
                                  "target_block": sc.local.cfg.target_block}))
    raws = _make_raws(2, sc.n_in, rng)
    got = _run_blocks(sc.step, sc.init_carry(), raws)
    carry = single.init_carry()
    outs = []
    for raw in raws:
        for j in range(4):
            sub = raw[:, j * single.n_in * 2:(j + 1) * single.n_in * 2]
            carry, out = single.step(carry, sub, np.False_)
            outs.append(np.asarray(jax.device_get(out)))
    want = np.concatenate(outs, axis=-1)
    diff = got.astype(np.float64) - want.astype(np.float64)
    snr = 10 * np.log10((want.astype(np.float64) ** 2).mean()
                        / ((diff ** 2).mean() + 1e-30))
    # fused kernel (bf16x3 NCO/IQ postamble) vs the XLA f32 path: small
    # per-sample deviations, bounded codes, chain-contract SNR kept
    assert snr > 60.0, snr
    assert np.abs(diff).max() <= 32, np.abs(diff).max()


def test_sharded_dc_matches_exact_recurrence(rng):
    """The sharded DC blocker against the scalar double-precision oracle."""
    from iq_tool_tpu.ops import dc_block
    mesh = make_mesh(jax.devices(), channel_shards=1, time_shards=8)
    cfg = ChainConfig(input_format="cf32", output_format="cf32",
                      input_rate=100_000.0, dc_block=True, target_block=2048)
    sc = ShardedChain(cfg, mesh)
    n = sc.n_in
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    raw = np.empty((1, 2 * n), np.float32)
    raw[0, 0::2], raw[0, 1::2] = x.real, x.imag
    _, out = sc.step(sc.init_carry(), raw, np.False_)
    out = np.asarray(jax.device_get(out))[0]
    y = out[0::2] + 1j * out[1::2]
    alpha = dc_block.alpha_for_rate(100_000.0)
    a = 1.0 - alpha
    want = np.zeros(n, np.complex128)
    xp = 0.0
    yp = 0.0
    for i in range(n):
        want[i] = x[i] - xp + a * yp
        xp, yp = x[i], want[i]
    np.testing.assert_allclose(y, want, atol=3e-4)


def test_time_sharded_dft_engine_filter(rng):
    """A > 2048-tap stop-range rides the DFT overlap-save engine (the
    path the fused Pallas kernel accelerates on hardware); its (C, block)
    overlap-save carry must flow across time shards like any other
    stateful stage.  1-code tolerance: shard-local FFT windows
    re-associate float reductions."""
    from iq_tool_tpu.parallel.sharded import ShardedChain, make_mesh
    cfg = ChainConfig(
        input_format="cs16", output_format="cs16",
        input_rate=2_048_000.0, target_rate=1_488_375.0,
        dc_block=True, freq_shift_pre_hz=100_000.0,
        filters=[FilterRequest("stop-range", 0.0, 10_000.0)],
        target_block=1 << 16)
    mesh = make_mesh(jax.devices()[:4], 1, 4)       # 4-way time sharding
    sc = ShardedChain(cfg, mesh)
    plain = Chain(ChainConfig(**{**cfg.__dict__,
                                 "target_block": sc.local.cfg.target_block}))
    assert not plain.post_filter._exec_banded        # DFT engine engaged
    raws = _make_raws(2, sc.n_in, rng)
    a = _run_blocks(sc.step, sc.init_carry(), raws).astype(np.int32)
    b = _run_blocks(plain.step, plain.init_carry(1), raws).astype(np.int32)
    d = np.abs(a - b)
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() < 0.02


def _run_single_subblocks(cfg, sc, raws, t):
    """The plain single-device chain over the same stream, stepped at
    the per-shard block size (the ground truth for sharded runs)."""
    single = Chain(ChainConfig(**{**cfg.__dict__,
                                  "target_block": sc.local.cfg.target_block}))
    carry = single.init_carry()
    outs = []
    w = single.n_in * 2
    for raw in raws:
        for j in range(t):
            carry, out = single.step(carry, raw[:, j * w:(j + 1) * w],
                                     np.False_)
            outs.append(np.asarray(jax.device_get(out)))
    return np.concatenate(outs, axis=-1)


def test_sharded_wire_stage0_dc_interpret(rng, monkeypatch):
    """The sharded DC-fused wire stage 0 (banded_apply_dc + the z·E /
    W_head linear stitch with the corrected-tail ppermute,
    _wire_stage0_dc) vs the plain single-device XLA chain — the full
    flagship shape incl. post shift + AGC after the resampler."""
    from iq_tool_tpu.ops import pallas_kernels
    from iq_tool_tpu.parallel import sharded as sharded_mod

    calls = []
    post_calls = []
    orig = pallas_kernels.banded_apply_dc
    orig_post = pallas_kernels.post_apply

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    def spy_post(*a, **k):
        r = orig_post(*a, **k)
        if r is not None:
            post_calls.append(1)
        return r

    monkeypatch.setattr(sharded_mod, "_FUSED_INTERPRET", True)
    monkeypatch.setattr(pallas_kernels, "banded_apply_dc", spy)
    monkeypatch.setattr(pallas_kernels, "post_apply", spy_post)
    mesh = make_mesh(jax.devices()[:4], channel_shards=1, time_shards=4)
    cfg = _full_cfg(block=4096)
    sc = ShardedChain(cfg, mesh)
    raws = _make_raws(3, sc.n_in, rng)
    got = _run_blocks(sc.step, sc.init_carry(), raws)
    assert calls, "banded_apply_dc never engaged on the sharded path"
    assert post_calls, "fused post kernel never engaged on the sharded path"
    want = _run_single_subblocks(cfg, sc, raws, 4)
    diff = got.astype(np.float64) - want.astype(np.float64)
    snr = 10 * np.log10((want.astype(np.float64) ** 2).mean()
                        / ((diff ** 2).mean() + 1e-30))
    assert snr > 60.0, snr
    assert np.abs(diff).max() <= 32, np.abs(diff).max()


def test_sharded_wire_stage0_nco_parity(rng, monkeypatch):
    """Config #2 shape sharded (shift -> resample, lowpass composed into
    a stage, NO dc): the exact wire stage 0 (_wire_stage0, decoded
    rotated-tail halo) + last-stage pack-out vs the plain XLA chain.
    bf16x3 kernel bound: +-1 code on a small fraction."""
    from iq_tool_tpu.parallel import sharded as sharded_mod
    monkeypatch.setattr(sharded_mod, "_FUSED_INTERPRET", True)
    mesh = make_mesh(jax.devices()[:4], channel_shards=1, time_shards=4)
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      freq_shift_pre_hz=250_000.0,
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      target_block=4096)
    sc = ShardedChain(cfg, mesh)
    assert sc.local.pre_filter is None       # lowpass fused into a stage
    raws = _make_raws(3, sc.n_in, rng)
    got = _run_blocks(sc.step, sc.init_carry(), raws)
    want = _run_single_subblocks(cfg, sc, raws, 4)
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    assert (diff != 0).mean() < 0.05, (diff != 0).mean()


def test_sharded_wire_to_wire_single_stage(rng, monkeypatch):
    """Single-stage cascade (441/512) with nothing else: the sharded
    step runs wire in AND out in ONE kernel per shard (pack epilogue);
    parity vs the plain XLA chain."""
    from iq_tool_tpu.parallel import sharded as sharded_mod
    monkeypatch.setattr(sharded_mod, "_FUSED_INTERPRET", True)
    mesh = make_mesh(jax.devices()[:4], channel_shards=1, time_shards=4)
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_764_000.0,
                      target_block=4096)
    sc = ShardedChain(cfg, mesh)
    assert len(sc.local.resampler.stages) == 1
    raws = _make_raws(3, sc.n_in, rng)
    got = _run_blocks(sc.step, sc.init_carry(), raws)
    want = _run_single_subblocks(cfg, sc, raws, 4)
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    assert (diff != 0).mean() < 0.05, (diff != 0).mean()


def test_sharded_wire_stage0_dc_reset(rng, monkeypatch):
    """Discontinuity reset through the wire-fused sharded path equals a
    fresh start (the zero'd rs0/dc carries feed the stitch correctly)."""
    from iq_tool_tpu.parallel import sharded as sharded_mod
    monkeypatch.setattr(sharded_mod, "_FUSED_INTERPRET", True)
    mesh = make_mesh(jax.devices()[:4], channel_shards=1, time_shards=4)
    cfg = _full_cfg(block=4096)
    sc = ShardedChain(cfg, mesh)
    raws = _make_raws(2, sc.n_in, rng)
    carry = sc.init_carry()
    carry, _ = sc.step(carry, raws[0], np.False_)
    _, out_reset = sc.step(carry, raws[1], np.True_)
    _, out_fresh = sc.step(sc.init_carry(), raws[1], np.False_)
    np.testing.assert_array_equal(np.asarray(jax.device_get(out_reset)),
                                  np.asarray(jax.device_get(out_fresh)))


def test_sharded_digital_agc_fused_xla_decisions(rng, monkeypatch):
    """The sharded fused post kernel (interpret) and the sharded XLA
    post path must make identical digital AGC lock/clip/creep decisions:
    both measure the pmax block peak PRE-post-NCO, so the carried
    AgcState must match exactly across the paths (the chain-level twin
    is tests/test_agc.py::test_digital_fused_xla_decision_equivalence)."""
    from iq_tool_tpu.parallel import sharded as sharded_mod

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      freq_shift_post_hz=-25_000.0,
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      agc_profile="digital", target_block=4096)
    mesh = make_mesh(jax.devices()[:4], channel_shards=1, time_shards=4)

    def run():
        sc = ShardedChain(cfg, mesh)
        carry = sc.init_carry()
        raws = _make_raws(6, sc.n_in, np.random.default_rng(7))
        states, outs = [], []
        for r in raws:
            carry, o = sc.step(carry, r, np.False_)
            states.append(jax.device_get(carry["agc"]))
            outs.append(np.asarray(jax.device_get(o)))
        return states, outs

    xla_states, xla_outs = run()
    monkeypatch.setattr(sharded_mod, "_FUSED_INTERPRET", True)
    fused_states, fused_outs = run()
    for sx, sf in zip(xla_states, fused_states):
        np.testing.assert_array_equal(np.asarray(sx.locked),
                                      np.asarray(sf.locked))
        np.testing.assert_array_equal(np.asarray(sx.gain),
                                      np.asarray(sf.gain))
    for ox, of in zip(xla_outs, fused_outs):
        assert np.abs(ox.astype(np.int32) - of.astype(np.int32)).max() <= 1


def test_carry_struct_creates_no_eager_arrays(monkeypatch):
    """Constructing a ShardedChain and inspecting its carry struct/specs
    must never execute an eager device op: an eager complex64 zeros is
    an UNIMPLEMENTED per-op program on the axon PJRT backend and poisons
    every subsequent compile in the process.  _carry_struct's old
    ``st.init(1).shape`` was exactly that — the root cause of the
    round-2/3 on-silicon sharded-program rejections (docs/PERF.md)."""
    import jax.numpy as jnp

    eager = []
    orig = jnp.zeros

    def spy(*a, **k):
        r = orig(*a, **k)
        if not isinstance(r, jax.core.Tracer):
            eager.append((a, k))
        return r

    monkeypatch.setattr(jnp, "zeros", spy)
    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      dc_block=True, freq_shift_pre_hz=100e3,
                      filters=[FilterRequest("lowpass", 400_000.0)])
    sc = ShardedChain(cfg, make_mesh(jax.devices()[:8], 1, 8))
    struct = sc._carry_struct()
    specs = sc.carry_specs()
    assert not eager, f"eager device arrays created: {eager}"
    assert set(struct) == set(specs)
    # halo widths still resolve to the real stage history sizes
    assert all(h > 0 for kind, h in struct.values() if kind == "halo")
