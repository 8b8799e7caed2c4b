"""Pallas banded kernel vs the XLA build_windows+matmul reference.

Runs in interpret mode (tests are on CPU); on TPU the same kernel code
compiles via Mosaic.  Tolerances reflect the kernels' 3-term bf16 matmul
scheme (~4e-5 relative, ~88 dB — see ops/pallas_kernels.py), not f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iq_tool_tpu.ops import banded, pallas_kernels


def _ref(state_r, state_i, xr, xi, a_r, a_i, stride, hist):
    ext_r = np.concatenate([state_r, xr], axis=-1)
    ext_i = np.concatenate([state_i, xi], axis=-1)
    wr = banded.build_windows(ext_r, stride, hist)
    wi = banded.build_windows(ext_i, stride, hist)
    return banded.window_matmul_planar(wr, wi, a_r, a_i)


def _rand_case(rng, stride, hist, g, nb, ch, complex_taps=False):
    n = stride * nb
    l = stride + hist
    state_r = rng.standard_normal((ch, hist)).astype(np.float32)
    state_i = rng.standard_normal((ch, hist)).astype(np.float32)
    xr = rng.standard_normal((ch, n)).astype(np.float32)
    xi = rng.standard_normal((ch, n)).astype(np.float32)
    a_r = rng.standard_normal((l, g)).astype(np.float32)
    a_i = (rng.standard_normal((l, g)).astype(np.float32)
           if complex_taps else None)
    return state_r, state_i, xr, xi, a_r, a_i


@pytest.mark.parametrize("stride,hist,g,nb,ch", [
    # strides are all 128-multiples: real Mosaic only lowers the
    # (cb, tb*s) -> (cb, tb, s) window cast for s % 128 == 0 (probed on
    # silicon: s=32/64/96/224 all reject), and plan() gates accordingly
    (128, 23, 57, 8, 3),    # resampler-stage-like (p<q band)
    (128, 31, 32, 16, 2),   # FIR-like toeplitz geometry
    (128, 1, 96, 4, 2),     # minimal history
    (128, 23, 57, 16, 8),   # 8-channel blocks (cb=8 path)
    (256, 54, 216, 16, 8),  # shift fast path, FIR-like
    (512, 23, 441, 8, 8),   # shift fast path, NRSC-5 stage-1 geometry
    (256, 287, 216, 16, 8),  # hist > stride: 3-part shift (NRSC-5 stage 2)
    (128, 300, 64, 16, 8),  # hist > 2*stride: 4-part shift
    (256, 287, 216, 18, 8),  # ragged grid: nb=18 has no div-8 divisor
    (512, 31, 441, 14, 8),  # ragged grid, assemble mode
])
def test_banded_pallas_matches_xla(rng, stride, hist, g, nb, ch):
    case = _rand_case(rng, stride, hist, g, nb, ch)
    ref_r, ref_i = _ref(*case, stride, hist)
    out_r, out_i = pallas_kernels.banded_apply(*case, stride, hist,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                               rtol=5e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                               rtol=5e-4, atol=2e-3)


def test_hist_beyond_stride_falls_back():
    """hist > stride needs the k-part shift formulation, which requires a
    lane-aligned stride and a bounded part count; anything else must take
    the XLA path."""
    assert pallas_kernels.plan(16, 55, 16, 32, 1) is None      # s not 128k
    assert pallas_kernels.plan(128, 600, 16, 32, 8) is None    # parts > 4
    got = pallas_kernels.plan(256, 287, 216, 16, 8)            # 3-part ok
    assert got is not None and got[3] == "shift"


def test_banded_complex_taps_hist_beyond_stride(rng):
    """Complex chunks through the k-part shift path (composed off-center
    FIR folded into a deep-history stage)."""
    stride, hist, g, nb, ch = 128, 200, 64, 16, 8
    case = _rand_case(rng, stride, hist, g, nb, ch, complex_taps=True)
    ref_r, ref_i = _ref(*case, stride, hist)
    out_r, out_i = pallas_kernels.banded_apply(*case, stride, hist,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                               rtol=5e-4, atol=4e-3)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                               rtol=5e-4, atol=4e-3)


def test_banded_pack_cs16_ragged_grid(rng):
    """pack_cs16 epilogue under a ragged grid (masked last tile) — the
    flagship's stage-2 shape (nb = 882-like odd-composite counts)."""
    from iq_tool_tpu.ops import convert
    from iq_tool_tpu.formats import get_format
    stride, hist, g, nb, ch = 256, 287, 216, 18, 8
    sr, si, xr, xi, a_r, a_i = _rand_case(rng, stride, hist, g, nb, ch)
    # keep |y| < 1 so the cs16 quantizer does not clip
    sr, si, xr, xi = sr * 0.01, si * 0.01, xr * 0.01, xi * 0.01
    ref_r, ref_i = _ref(sr, si, xr, xi, a_r, a_i, stride, hist)
    wire = pallas_kernels.banded_apply(sr, si, xr, xi, a_r, a_i,
                                       stride, hist, interpret=True,
                                       pack_fmt="cs16")
    want = np.asarray(convert.from_planar(
        jnp.asarray(np.asarray(ref_r)), jnp.asarray(np.asarray(ref_i)),
        get_format("cs16")))
    got = np.asarray(wire).view(np.int16).reshape(ch, -1)
    d = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert d.max() <= 1, d.max()


def test_banded_pallas_complex_taps(rng):
    stride, hist, g, nb, ch = 128, 40, 64, 8, 2
    case = _rand_case(rng, stride, hist, g, nb, ch, complex_taps=True)
    ref_r, ref_i = _ref(*case, stride, hist)
    out_r, out_i = pallas_kernels.banded_apply(*case, stride, hist,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                               rtol=5e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                               rtol=5e-4, atol=2e-3)


def test_state_actually_feeds_first_windows(rng):
    """A nonzero carry must shape the first outputs (left-context path)."""
    stride, hist, g, nb, ch = 128, 8, 32, 8, 1
    case = list(_rand_case(rng, stride, hist, g, nb, ch))
    out1 = pallas_kernels.banded_apply(*case, stride, hist, interpret=True)
    case[0] = case[0] + 1.0   # perturb state_r
    out2 = pallas_kernels.banded_apply(*case, stride, hist, interpret=True)
    d = np.abs(np.asarray(out1[0]) - np.asarray(out2[0]))
    assert d[:, :g].max() > 0          # first group affected
    assert d[:, 2 * g:].max() == 0     # later groups untouched

def test_dc_prefix_engines_agree(rng, monkeypatch):
    """The two in-subtile DC prefix engines (HIGHEST triangular matmul,
    masked log-step lane cumsum — see _DC_PREFIX_CUMSUM) compute the same
    recurrence; both must track the per-sample scan and each other, so
    the non-default engine cannot rot (it is the measured A/B fallback,
    tools/dc_ab.py)."""
    from iq_tool_tpu.ops import dc_block as dcb
    ch, n = 8, 4096
    alpha = dcb.alpha_for_rate(2_048_000.0)
    xr = rng.standard_normal((ch, n)).astype(np.float32)
    xi = rng.standard_normal((ch, n)).astype(np.float32)
    st4 = rng.standard_normal((ch, 4)).astype(np.float32)
    outs = {}
    for flag in (True, False):
        monkeypatch.setattr(pallas_kernels, "_DC_PREFIX_CUMSUM", flag)
        out = pallas_kernels.dc_block_apply(xr, xi, st4, alpha,
                                            interpret=True)
        assert out is not None
        outs[flag] = tuple(np.asarray(v) for v in out)
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    ref, _, _ = dcb._apply_plane(xr, st4[:, 0], st4[:, 2], alpha)
    np.testing.assert_allclose(outs[True][0], np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dc_block_pallas_matches_xla(rng):
    from iq_tool_tpu.ops import dc_block as dcb
    ch, n = 8, 2048
    alpha = dcb.alpha_for_rate(2_048_000.0)
    xr = rng.standard_normal((ch, n)).astype(np.float32)
    xi = rng.standard_normal((ch, n)).astype(np.float32)
    st = dcb.PlanarDcState(
        rng.standard_normal(ch).astype(np.float32),
        rng.standard_normal(ch).astype(np.float32),
        rng.standard_normal(ch).astype(np.float32),
        rng.standard_normal(ch).astype(np.float32))
    ref_r, _, ref_st = dcb._apply_plane(xr, st.xr_prev, st.yr_prev, alpha)
    ref_i, _, _ = dcb._apply_plane(xi, st.xi_prev, st.yi_prev, alpha)

    st4 = np.stack([st.xr_prev, st.xi_prev, st.yr_prev, st.yi_prev], -1)
    out = pallas_kernels.dc_block_apply(xr, xi, st4, alpha, interpret=True)
    assert out is not None
    yr, yi, new_st = out
    np.testing.assert_allclose(np.asarray(yr), np.asarray(ref_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ref_i),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_st[:, 2]), np.asarray(ref_st),
                               rtol=1e-4, atol=1e-4)
    # streaming: two half blocks == one whole block
    h = n // 2
    y1r, y1i, s1 = pallas_kernels.dc_block_apply(
        xr[:, :h], xi[:, :h], st4, alpha, interpret=True)
    y2r, y2i, _ = pallas_kernels.dc_block_apply(
        xr[:, h:], xi[:, h:], np.asarray(s1), alpha, interpret=True)
    np.testing.assert_allclose(np.concatenate([y1r, y2r], -1),
                               np.asarray(yr), rtol=1e-4, atol=1e-4)


def test_dc_fused_iq_nco_postamble(rng):
    """dc_block_apply with fused I/Q + NCO equals the separate planar ops."""
    from iq_tool_tpu.ops import dc_block as dcb
    from iq_tool_tpu.ops import iq_balance, nco
    ch, n = 8, 1024
    alpha = dcb.alpha_for_rate(2_048_000.0)
    xr = rng.standard_normal((ch, n)).astype(np.float32)
    xi = rng.standard_normal((ch, n)).astype(np.float32)
    st4 = rng.standard_normal((ch, 4)).astype(np.float32)
    factors = (rng.standard_normal((ch, 2)) * 0.01).astype(np.float32)
    dtheta = int(nco.freq_to_dtheta(100e3, 2_048_000.0))
    acc = rng.integers(0, 2**32, (ch, 1), dtype=np.uint32)

    # reference: separate ops
    st = dcb.PlanarDcState(st4[:, 0], st4[:, 1], st4[:, 2], st4[:, 3])
    rr, _, _ = dcb._apply_plane(xr, st.xr_prev, st.yr_prev, alpha)
    ri, _, _ = dcb._apply_plane(xi, st.xi_prev, st.yi_prev, alpha)
    rr, ri = iq_balance.apply_planar(rr, ri, factors)
    rr, ri, _ = nco.apply_planar(rr, ri, acc[:, 0], np.uint32(dtheta))

    out = pallas_kernels.dc_block_apply(xr, xi, st4, alpha, factors, acc,
                                        dtheta, interpret=True)
    assert out is not None
    yr, yi, _ = out
    np.testing.assert_allclose(np.asarray(yr), np.asarray(rr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ri),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n,dtheta,profile", [
    (11907, 123456789, "local"),     # ragged CLI framing + NCO + rms AGC
    (95256, 0, "local"),             # grown framing, gains only
    (16384, 987654321, None),        # aligned, NCO only
    (12000, 55555, "digital"),       # single-gain path
])
def test_post_apply_matches_xla_chain(rng, n, dtheta, profile):
    """The fused post kernel (interpret) against the separate XLA ops:
    NCO mix -> gain apply -> cs16 quantize/interleave.  Gains/phases are
    shared, so outputs must agree to the last code except where the
    kernel's own f32 op ordering moves a value across a rounding
    boundary (+-1 code on a tiny fraction)."""
    from iq_tool_tpu import constants as C
    from iq_tool_tpu.ops import agc as agc_ops
    from iq_tool_tpu.ops import convert, nco, pallas_kernels

    ch = 8
    xr = rng.standard_normal((ch, n)).astype(np.float32) * 0.4
    xi = rng.standard_normal((ch, n)).astype(np.float32) * 0.4
    if profile == "local":
        cfg = agc_ops.AgcConfig.make("local", 1_488_375.0)
        n_seg, sl, beta = agc_ops.rms_params(cfg, n)
        assert sl == C.AGC_SEGMENT
        e_in = (xr[:, :n_seg * sl].reshape(ch, n_seg, sl) ** 2
                + xi[:, :n_seg * sl].reshape(ch, n_seg, sl) ** 2
                ).mean(-1).T
        gains_t, g_fin, _ = agc_ops.rms_scan(
            jnp.asarray(e_in), jnp.ones((ch,), jnp.float32),
            jnp.zeros((ch,), jnp.float32), beta, cfg.target)
        gains = np.asarray(gains_t).T
        seg = sl
    elif profile == "digital":
        gains = rng.uniform(0.5, 2.0, (ch, 1)).astype(np.float32)
        seg = 0
    else:
        gains = np.ones((ch, 1), np.float32)
        seg = 0
    pacc = rng.integers(0, 2 ** 32, (ch, 1), dtype=np.uint32) \
        if dtheta else None

    got_i32 = pallas_kernels.post_apply(
        jnp.asarray(xr), jnp.asarray(xi), jnp.asarray(gains), seg,
        jnp.asarray(pacc) if pacc is not None else None, dtheta,
        interpret=True)
    assert got_i32 is not None
    got = np.asarray(jax.lax.bitcast_convert_type(got_i32, jnp.int16)
                     ).reshape(ch, 2 * n)

    # XLA reference with the same gains/phases
    yr, yi = jnp.asarray(xr), jnp.asarray(xi)
    if dtheta:
        yr, yi, _ = nco.apply_planar(yr, yi, jnp.asarray(pacc[:, 0]),
                                     np.uint32(dtheta))
    if seg:
        n_seg = gains.shape[-1]
        g_full = np.repeat(gains, seg, axis=-1)
        if g_full.shape[-1] < n:                      # ragged tail: g_fin
            pad = np.repeat(gains[:, -1:], n - g_full.shape[-1], axis=-1)
            g_full = np.concatenate([g_full, pad], axis=-1)
        yr = yr * g_full
        yi = yi * g_full
    else:
        yr = yr * gains
        yi = yi * gains
    want = np.asarray(convert.from_planar(yr, yi, "cs16"))

    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    assert (diff != 0).mean() < 2e-3, (diff != 0).mean()


def test_fused_post_chain_parity(rng, monkeypatch):
    """Whole-chain parity: _fused_post (interpret) vs the separate-op
    chain across carried blocks (gain scan state, NCO phase carry)."""
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      freq_shift_post_hz=25_000.0, agc_profile="local",
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      target_block=4096)
    raws = [rng.integers(-2 ** 14, 2 ** 14, (1, Chain(cfg).in_wire_len))
            .astype(np.int16) for _ in range(3)]

    def run():
        ch = Chain(cfg)
        carry = ch.init_carry()
        outs = []
        for r in raws:
            carry, o = ch.step(carry, r, np.False_)
            outs.append(np.asarray(jax.device_get(o)))
        return np.concatenate(outs, -1)

    want = run()
    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    got = run()
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    assert (diff != 0).mean() < 2e-3, (diff != 0).mean()


@pytest.mark.parametrize("gain,exact", [(1.0, True), (1.7, False)])
def test_dc_block_wire_input_matches_planar(rng, gain, exact):
    """Wire mode (packed int32 cs16 de-interleaved in-register) against
    the planar-input kernel fed by convert.to_planar.  At gain 1 the
    conversion is exact (power-of-two normalizer), so outputs are
    bitwise equal; with a gain, XLA may fold to_planar's two constant
    multiplies into one, a 1-ulp input delta the IIR amplifies by its
    ~1/sqrt(1-a^2t) condition — bounded, not bitwise."""
    from iq_tool_tpu.ops import convert

    ch, n = 8, 4096
    raw = rng.integers(-2 ** 15, 2 ** 15, (ch, 2 * n)).astype(np.int16)
    xr, xi = convert.to_planar(jnp.asarray(raw), "cs16", gain)
    st = rng.standard_normal((ch, 4)).astype(np.float32)
    alpha = 2 * np.pi * 10.0 / 2_048_000.0
    pacc = rng.integers(0, 2 ** 32, (ch, 1), dtype=np.uint32)
    iqf = rng.standard_normal((ch, 2)).astype(np.float32) * 0.01
    dth = 424242

    want = pallas_kernels.dc_block_apply(
        xr, xi, jnp.asarray(st), alpha, jnp.asarray(iqf),
        jnp.asarray(pacc), dth, interpret=True)
    wire = jax.lax.bitcast_convert_type(
        jnp.asarray(raw).reshape(ch, n, 2), jnp.int32)
    got = pallas_kernels.dc_block_apply(
        None, None, jnp.asarray(st), alpha, jnp.asarray(iqf),
        jnp.asarray(pacc), dth, interpret=True,
        wire_i32=wire, wire_norm=1.0 / 32768.0, wire_gain=gain)
    assert got is not None and want is not None
    for g, w in zip(got, want):
        if exact:
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        else:
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=5e-5)


def test_fused_pre_wire_chain_parity(rng, monkeypatch):
    """Whole-chain parity: the wire-input fused pre kernel (interpret)
    vs the separate-op chain across carried blocks."""
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      dc_block=True, iq_correction=True,
                      freq_shift_pre_hz=100_000.0,
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      target_block=4096)
    raws = [rng.integers(-2 ** 14, 2 ** 14, (1, Chain(cfg).in_wire_len))
            .astype(np.int16) for _ in range(3)]

    def run():
        ch = Chain(cfg)
        carry = ch.init_carry()
        outs = []
        for r in raws:
            carry, o = ch.step(carry, r, np.False_)
            outs.append(np.asarray(jax.device_get(o)))
        return np.concatenate(outs, -1)

    want = run()
    monkeypatch.setattr(chain_mod, "_FUSED_PRE_INTERPRET", True)
    got = run()
    diff = got.astype(np.int32) - want.astype(np.int32)
    # the fused DC recurrence differs from the XLA two-level scan in f32
    # association (same bound as the sharded/folded DC contract)
    assert np.abs(diff).max() <= 4, np.abs(diff).max()


def test_post_filter_pack_chain_parity(rng, monkeypatch):
    """Post lowpass too big to compose into the resampler
    (> FUSE_MAX_TAPS): it quantizes straight to the wire in its kernel
    epilogue instead of a separate convert pass.  Parity vs the
    separate filter + convert path across carried blocks, and the
    packed path must actually engage.  (Odd output counts like 11907
    cannot lane-align — plan() declines and the chain falls back; this
    uses a /2 ratio so n_out tiles.)"""
    from iq_tool_tpu.ops import banded
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_024_000.0,
                      dc_block=True, freq_shift_pre_hz=100_000.0,
                      filters=[FilterRequest("lowpass", 300_000.0)],
                      filter_taps=301,
                      target_block=4096)
    raws = [rng.integers(-2 ** 14, 2 ** 14, (1, Chain(cfg).in_wire_len))
            .astype(np.int16) for _ in range(3)]

    def run():
        ch = Chain(cfg)
        carry = ch.init_carry()
        outs = []
        for r in raws:
            carry, o = ch.step(carry, r, np.False_)
            outs.append(np.asarray(jax.device_get(o)))
        return np.concatenate(outs, -1)

    want = run()
    calls = []
    orig = banded.apply_planar_packed

    def spy(*a, **k):
        res = orig(*a, **k)
        calls.append(res is not None)
        return res

    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    monkeypatch.setattr(banded, "apply_planar_packed", spy)
    got = run()
    assert any(calls), "post-filter pack path never engaged"
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    # 301-tap accumulation: more half-ULP straddles than the small
    # resampler bands, so +-1 flips are denser (bf16x3 vs HIGH rounding)
    assert (diff != 0).mean() < 3e-2, (diff != 0).mean()


@pytest.mark.parametrize("fmt", ["cs16", "sc16q11", "cu16", "cu8", "cs8"])
def test_banded_pack_wire_bitwise(fmt, rng):
    """pack_fmt epilogue vs the planar kernel + convert.from_planar for
    EVERY packable output format: identical quantization math, so the
    wire bytes are bitwise equal (including unsigned offsets and the
    int16 narrowing for 8-bit wires)."""
    from iq_tool_tpu.ops import convert

    stride, hist, g, nb, ch = 128, 23, 57, 16, 8  # resampler-stage-like
    n = nb * stride
    xr = rng.standard_normal((ch, n)).astype(np.float32) * 0.3
    xi = rng.standard_normal((ch, n)).astype(np.float32) * 0.3
    sr = rng.standard_normal((ch, hist)).astype(np.float32)
    si = rng.standard_normal((ch, hist)).astype(np.float32)
    a_r = rng.standard_normal((stride + hist, g)).astype(np.float32) * 0.05
    assert pallas_kernels.plan(stride, hist, g, nb, ch) is not None
    yr, yi = pallas_kernels.banded_apply(sr, si, xr, xi, a_r, None,
                                         stride, hist, interpret=True)
    want = np.asarray(convert.from_planar(yr, yi, fmt))
    packed = pallas_kernels.banded_apply(sr, si, xr, xi, a_r, None,
                                         stride, hist, interpret=True,
                                         pack_fmt=fmt)
    got = np.asarray(convert.packed_to_wire(packed, fmt))
    # the two programs compile separately, so XLA may contract the
    # unsigned quantizer's mul+add into an FMA in one and not the other:
    # half-ULP straddles may flip by one code on a handful of samples
    d = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert d.max() <= 1 and (d != 0).mean() < 1e-3, (
        d.max(), (d != 0).mean())


@pytest.mark.parametrize("fmt", ["cs16", "sc16q11", "cu16", "cu8", "cs8"])
def test_post_apply_pack_wire_bitwise(fmt, rng):
    """post_apply's fused NCO+gain+quantize for every packable format vs
    the separate XLA ops + convert.from_planar (gain path seg=0)."""
    from iq_tool_tpu.ops import convert, nco
    from iq_tool_tpu.ops import pallas_kernels as pk

    ch, n = 4, 4096
    xr = rng.standard_normal((ch, n)).astype(np.float32) * 0.4
    xi = rng.standard_normal((ch, n)).astype(np.float32) * 0.4
    gains = (0.5 + rng.random((ch, 1))).astype(np.float32)
    dth = nco.freq_to_dtheta(-50e3, 1_488_375.0)
    pacc = rng.integers(0, 2 ** 32, (ch, 1), dtype=np.uint32)
    packed = pk.post_apply(jnp.asarray(xr), jnp.asarray(xi),
                           jnp.asarray(gains), 0, jnp.asarray(pacc),
                           dth, interpret=True, out_fmt=fmt)
    assert packed is not None
    got = np.asarray(convert.packed_to_wire(packed, fmt))
    yr, yi, _ = nco.apply_planar(jnp.asarray(xr), jnp.asarray(xi),
                                 jnp.asarray(pacc[:, 0]), jnp.uint32(dth))
    want = np.asarray(convert.from_planar(yr * gains, yi * gains, fmt))
    # the fused path mixes with the table/in-kernel f32 cos/sin at the
    # same indices; quantization straddles may differ by 1 code
    d = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert d.max() <= 1 and (d != 0).mean() < 2e-3, (d.max(), (d != 0).mean())


def test_chain_packed_out_parity(rng, monkeypatch):
    """Config #1 shape (cs16 -> resample -> cs16, nothing after the
    resampler): the fully fused wire-in + pack-out path (interpret) vs
    the XLA chain across carried blocks.  target_block 131072 makes BOTH
    stages plan (smaller framings leave the last stage on XLA and the
    pack branch untested), so the interpret run puts both on the bf16x3
    kernel matmuls while the reference runs XLA f32 — the delta is the
    kernels' established ~4e-5 bound, +-1 code on a small fraction (on
    hardware both paths share the kernels)."""
    from iq_tool_tpu.ops import pallas_kernels as pk
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      target_block=131072)
    probe = Chain(cfg)
    # guard against the vacuous-geometry regression: the LAST stage must
    # actually plan, or the pack branch silently never runs
    st = probe.resampler.stages[-1]
    n_last = probe.n_in
    for stg in probe.resampler.stages[:-1]:
        n_last = n_last * stg.p // stg.q
    assert pk.plan(st.stride, st.hist, st._a.shape[1],
                   n_last // st.stride, 1) is not None
    raws = [rng.integers(-2 ** 14, 2 ** 14, (1, probe.in_wire_len))
            .astype(np.int16) for _ in range(2)]

    def run():
        ch = Chain(cfg)
        carry = ch.init_carry()
        outs = []
        for r in raws:
            carry, o = ch.step(carry, r, np.False_)
            outs.append(np.asarray(jax.device_get(o)))
        return np.concatenate(outs, -1)

    want = run()
    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    got = run()
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    assert (diff != 0).mean() < 0.05, (diff != 0).mean()


def test_chain_cu8_wire_to_wire_parity(rng, monkeypatch):
    """cu8 -> cu8 wire->wire, the reference proof-point FORMAT pair
    (iq_tool_presets.conf:190-196 + constants.h:200) at the flagship
    ratio: the fully fused cu8-wire-in + cu8-pack-out path vs the XLA
    chain, same +-1-code contract as the cs16 parity test.  (At the
    NRSC5 2.4 Msps input rate the stage strides are 400/144 — not
    lane-aligned, so plan() declines and the whole chain runs XLA: see
    test_chain_cu8_nrsc5_ratio_xla below.)"""
    from iq_tool_tpu.ops import pallas_kernels as pk
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cu8", output_format="cu8",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      dc_block=True, target_block=131072)
    probe = Chain(cfg)
    # the fused wire->wire path must actually ENGAGE (guard against a
    # vacuous pass where both runs silently take the XLA path)
    st0 = probe.resampler.stages[0]
    assert pk.plan(st0.stride, st0.hist, st0._a.shape[1],
                   probe.n_in // st0.stride, 1, dc=True) is not None
    raws = [rng.integers(0, 256, (1, probe.in_wire_len)).astype(np.uint8)
            for _ in range(2)]

    def run():
        ch = Chain(cfg)
        carry = ch.init_carry()
        outs = []
        for r in raws:
            carry, o = ch.step(carry, r, np.False_)
            outs.append(np.asarray(jax.device_get(o)))
        return np.concatenate(outs, -1)

    want = run()
    assert want.dtype == np.uint8
    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    got = run()
    assert got.dtype == np.uint8
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    assert (diff != 0).mean() < 0.05, (diff != 0).mean()


def test_chain_cu8_nrsc5_ratio_xla(rng):
    """The exact NRSC5 preset rates (2.4 Msps cu8 -> 1.488375 Msps cu8)
    produce non-lane-aligned stage strides (400/144) that the Pallas
    plan correctly declines — the chain must still run (XLA path) with
    exact frame accounting."""
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cu8", output_format="cu8",
                      input_rate=2_400_000.0, target_rate=1_488_375.0,
                      dc_block=True, target_block=131072)
    ch = Chain(cfg)
    raw = rng.integers(0, 256, (1, ch.in_wire_len)).astype(np.uint8)
    carry = ch.init_carry()
    _, out = ch.step(carry, raw, np.False_)
    out = np.asarray(out)
    assert out.dtype == np.uint8
    assert out.shape[-1] == 2 * (ch.n_in * 3969 // 6400)


def test_chain_sc16q11_wire_in_parity(rng, monkeypatch):
    """BladeRF's native sc16q11 ingest rides the same packed int16 wire
    as cs16 (only the normalizer differs, sample_convert.c:135-202):
    fused wire-in + pack-out vs the XLA chain."""
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="sc16q11", output_format="sc16q11",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      target_block=131072)
    probe = Chain(cfg)
    raws = [rng.integers(-2048, 2048, (1, probe.in_wire_len))
            .astype(np.int16) for _ in range(2)]

    def run():
        ch = Chain(cfg)
        carry = ch.init_carry()
        outs = []
        for r in raws:
            carry, o = ch.step(carry, r, np.False_)
            outs.append(np.asarray(jax.device_get(o)))
        return np.concatenate(outs, -1)

    want = run()
    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    got = run()
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    assert (diff != 0).mean() < 0.05, (diff != 0).mean()


def test_banded_wire_nco_decode(rng):
    """Wire mode + fused pre-NCO: decode -> rotate at global indices ->
    banded matmul, vs the separate XLA ops (to_planar -> nco -> banded
    windows).  The carried state arrives pre-rotated in both."""
    from iq_tool_tpu.ops import banded as bnd
    from iq_tool_tpu.ops import convert, nco

    stride, hist, g, nb, ch = 128, 23, 57, 16, 8
    n = nb * stride
    dth = np.uint32(123456789)
    pacc = rng.integers(0, 2 ** 32, (ch,), dtype=np.uint32)
    raw = rng.integers(-2 ** 15, 2 ** 15, (ch, 2 * n)).astype(np.int16)
    a_r = rng.standard_normal((stride + hist, g)).astype(np.float32) * 0.05
    sr = rng.standard_normal((ch, hist)).astype(np.float32)
    si = rng.standard_normal((ch, hist)).astype(np.float32)

    xr, xi = convert.to_planar(jnp.asarray(raw), "cs16", 1.0)
    xr, xi, _ = nco.apply_planar(xr, xi, jnp.asarray(pacc), dth)
    ext_r = jnp.concatenate([jnp.asarray(sr), xr], axis=-1)
    ext_i = jnp.concatenate([jnp.asarray(si), xi], axis=-1)
    wr = bnd.build_windows(ext_r, stride, hist)
    wi = bnd.build_windows(ext_i, stride, hist)
    want_r, want_i = bnd.window_matmul_planar(wr, wi, a_r, None)

    wire = jax.lax.bitcast_convert_type(
        jnp.asarray(raw).reshape(ch, n, 2), jnp.int32)
    got_r, got_i = pallas_kernels.banded_apply(
        jnp.asarray(sr), jnp.asarray(si), None, None, a_r, None,
        stride, hist, interpret=True, wire_i32=wire,
        wire_norm=1.0 / 32768.0, nco_dtheta=int(dth),
        nco_phase=jnp.asarray(pacc)[:, None])
    for gv, wv in zip((got_r, got_i), (want_r, want_i)):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                                   atol=2e-4)


def test_chain_wire_nco_parity(rng, monkeypatch):
    """Config #2 shape (cs16 -> shift -> resample -> fused lowpass ->
    cs16): the wire-decode + fused pre-NCO + pack-out path (interpret)
    vs the XLA chain across carried blocks (bf16x3 +-1-code bound)."""
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      freq_shift_pre_hz=250_000.0,
                      filters=(FilterRequest("lowpass", 400_000.0),),
                      target_block=131072)
    probe = Chain(cfg)
    assert probe.pre_filter is None          # lowpass fused into a stage
    raws = [rng.integers(-2 ** 14, 2 ** 14, (1, probe.in_wire_len))
            .astype(np.int16) for _ in range(2)]

    def run():
        ch = Chain(cfg)
        carry = ch.init_carry()
        outs = []
        for r in raws:
            carry, o = ch.step(carry, r, np.False_)
            outs.append(np.asarray(jax.device_get(o)))
        return np.concatenate(outs, -1)

    want = run()
    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    got = run()
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()
    assert (diff != 0).mean() < 0.05, (diff != 0).mean()


def _run_chain_blocks(cfg, raws):
    from iq_tool_tpu.pipeline.chain import Chain

    ch = Chain(cfg)
    carry = ch.init_carry()
    outs = []
    for r in raws:
        carry, o = ch.step(carry, r, np.False_)
        outs.append(np.asarray(jax.device_get(o)))
    return np.concatenate(outs, -1)


@pytest.mark.parametrize("target_rate", [1_024_000.0, 1_488_375.0])
def test_dc_fused_stage0_chain_parity(rng, monkeypatch, target_rate):
    """Flagship shape (dc + shift + resample, lowpass composed into the
    cascade): the DC recurrence runs in resampler stage 0's wire-decode
    prologue (banded_apply_dc) — the separate pre-kernel pass and the
    XLA tail recompute both disappear.  Parity vs the XLA-op chain
    across carried blocks; the kernel must actually engage.  /2 covers
    'shift' mode (hist 287 > stride 256), the flagship ratio covers
    'assemble'."""
    from iq_tool_tpu.ops import pallas_kernels
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=target_rate,
                      dc_block=True, freq_shift_pre_hz=100_000.0,
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      target_block=4096)
    assert Chain(cfg).post_filter is None          # composed
    raws = [rng.integers(-2 ** 14, 2 ** 14, (1, Chain(cfg).in_wire_len))
            .astype(np.int16) for _ in range(3)]

    want = _run_chain_blocks(cfg, raws)
    calls = []
    orig = pallas_kernels.banded_apply_dc

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    monkeypatch.setattr(pallas_kernels, "banded_apply_dc", spy)
    got = _run_chain_blocks(cfg, raws)
    assert calls, "banded_apply_dc never engaged"
    diff = got.astype(np.int32) - want.astype(np.int32)
    # the in-kernel DC recurrence differs from the XLA two-level scan in
    # f32 association (same bound as the fused-pre / sharded contract)
    assert np.abs(diff).max() <= 4, np.abs(diff).max()


def test_dc_fused_stage0_vs_fused_pre(rng, monkeypatch):
    """The DC-fused stage 0 and the fused-pre + wire-stage0 paths share
    _dc_plane_tile / _nco_mix_base / the banded matmul, so their outputs
    agree to quantization: pin them within ±1 code of each other."""
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      dc_block=True, freq_shift_pre_hz=100_000.0,
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      target_block=4096)
    raws = [rng.integers(-2 ** 14, 2 ** 14, (1, Chain(cfg).in_wire_len))
            .astype(np.int16) for _ in range(2)]
    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    got = _run_chain_blocks(cfg, raws)
    monkeypatch.setenv("IQTOOL_DISABLE_DC_STAGE0", "1")
    monkeypatch.setattr(chain_mod, "_FUSED_PRE_INTERPRET", True)
    want = _run_chain_blocks(cfg, raws)
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 1, np.abs(diff).max()


def test_fused_pre_cu8_wire_chain_parity(rng, monkeypatch):
    """Config-#3 shape (cu8 -> dc -> fft band-pass -> resample): the
    fused pre kernel decodes the int16-packed cu8 wire in-register
    (round 4 — previously only cs16 had a wire path); parity vs the
    separate-op chain and the wire mode must actually engage."""
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cu8", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      dc_block=True,
                      filters=[FilterRequest("pass-range", 0.0, 400_000.0)],
                      filter_method="fft", filter_stage="pre",
                      target_block=4096)
    raws = [rng.integers(0, 256, (1, Chain(cfg).in_wire_len))
            .astype(np.uint8) for _ in range(3)]
    want = _run_chain_blocks(cfg, raws)

    wire_calls = []
    orig = pallas_kernels.dc_block_apply

    def spy(*a, **k):
        if k.get("wire_i32") is not None:
            wire_calls.append(k.get("wire_kind"))
        return orig(*a, **k)

    monkeypatch.setattr(chain_mod, "_FUSED_PRE_INTERPRET", True)
    monkeypatch.setattr(pallas_kernels, "dc_block_apply", spy)
    got = _run_chain_blocks(cfg, raws)
    assert "cu8" in wire_calls, wire_calls
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 4, np.abs(diff).max()


def test_dc_fused_stage0_cs8_wire_parity(rng, monkeypatch):
    """Flagship shape with a SIGNED 8-bit input (cs8, HackRF's native
    format): the DC-fused stage 0 decodes the int16-packed cs8 wire —
    covers the byte sign extension in the in-kernel decode."""
    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline import chain as chain_mod
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cs8", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      dc_block=True, freq_shift_pre_hz=100_000.0,
                      filters=[FilterRequest("lowpass", 400_000.0)],
                      target_block=4096)
    raws = [rng.integers(-128, 128, (1, Chain(cfg).in_wire_len))
            .astype(np.int8) for _ in range(3)]
    want = _run_chain_blocks(cfg, raws)

    calls = []
    orig = pallas_kernels.banded_apply_dc

    def spy(*a, **k):
        calls.append(k.get("wire_kind"))
        return orig(*a, **k)

    monkeypatch.setattr(chain_mod, "_FUSED_POST_INTERPRET", True)
    monkeypatch.setattr(pallas_kernels, "banded_apply_dc", spy)
    got = _run_chain_blocks(cfg, raws)
    assert "cs8" in calls, calls
    diff = got.astype(np.int32) - want.astype(np.int32)
    assert np.abs(diff).max() <= 4, np.abs(diff).max()


def test_assemble_unaligned_stride_falls_back():
    """Assemble-mode window tiling reshapes the bulk as (cb, tb*s) ->
    (cb, tb, s) — a Mosaic vector shape cast whose lane dim must stay
    128-aligned.  Real Mosaic rejects s % 128 != 0 ("unsupported shape
    cast"; hit by the folded CLI flagship whose small row block made
    stage 27/32 regroup to stride 224), so plan() must decline and the
    caller take the XLA windows path."""
    assert pallas_kernels.plan(224, 31, 189, 63, 8) is None
    assert pallas_kernels.plan(96, 31, 49, 64, 8) is None
    got = pallas_kernels.plan(256, 31, 189, 64, 8)
    assert got is not None and got[3] == "assemble"


def test_chain_block_grows_for_kernel_coverage(monkeypatch):
    """On TPU, Chain's block sizing treats per-stage kernel coverage as
    a soft constraint: the 16384-frame default block regroups stage
    27/32 to stride 224 (not lane-alignable: n/q = 441 is odd), which
    would fall off the Pallas path — the block must grow until every
    stage's kernel engages (row block 65536 -> stage 1 at stride 128)."""
    from iq_tool_tpu.ops import banded
    from iq_tool_tpu.pipeline.chain import Chain, ChainConfig

    cfg = ChainConfig(input_format="cs16", output_format="cs16",
                      input_rate=2_048_000.0, target_rate=1_488_375.0,
                      channels=1, dc_block=True,
                      freq_shift_pre_hz=100_000.0, target_block=16384)
    off_tpu = Chain(cfg)
    assert off_tpu.n_in == 16384          # no growth off-TPU
    monkeypatch.setattr(banded, "_on_tpu", lambda: True)
    on_tpu = Chain(cfg)
    assert on_tpu.n_in == 65536
    assert on_tpu.resampler.kernel_coverage(1)
    for st in on_tpu.resampler.stages:
        assert st.stride % 128 == 0
