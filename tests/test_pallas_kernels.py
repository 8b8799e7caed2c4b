"""Pallas banded kernel vs the XLA build_windows+matmul reference.

Runs in interpret mode (tests are on CPU); on TPU the same kernel code
compiles via Mosaic.  Tolerances reflect the kernels' 3-term bf16 matmul
scheme (~4e-5 relative, ~88 dB — see ops/pallas_kernels.py), not f32.
"""

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
    (64, 23, 57, 8, 3),     # resampler-stage-like (p<q band)
    (32, 31, 32, 16, 2),    # FIR-like toeplitz geometry
    (128, 1, 96, 4, 2),     # minimal history
    (64, 23, 57, 16, 8),    # 8-channel blocks (cb=8 path)
    (256, 54, 216, 16, 8),  # shift fast path, FIR-like
    (512, 23, 441, 8, 8),   # shift fast path, NRSC-5 stage-1 geometry
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
    """Wide multi-piece window assembly is gated out (Mosaic miscompiles
    many-piece lane concats); the dispatcher must take the XLA path."""
    assert pallas_kernels.plan(16, 55, 16, 32, 1) is None


def test_banded_pallas_complex_taps(rng):
    stride, hist, g, nb, ch = 64, 40, 64, 8, 2
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
    stride, hist, g, nb, ch = 32, 8, 32, 8, 1
    case = list(_rand_case(rng, stride, hist, g, nb, ch))
    out1 = pallas_kernels.banded_apply(*case, stride, hist, interpret=True)
    case[0] = case[0] + 1.0   # perturb state_r
    out2 = pallas_kernels.banded_apply(*case, stride, hist, interpret=True)
    d = np.abs(np.asarray(out1[0]) - np.asarray(out2[0]))
    assert d[:, :g].max() > 0          # first group affected
    assert d[:, 2 * g:].max() == 0     # later groups untouched

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
