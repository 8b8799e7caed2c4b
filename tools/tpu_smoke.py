"""On-hardware smoke/regression suite (run on a real TPU backend).

The pytest suite runs on CPU (tests/conftest.py forces an 8-device
virtual mesh), which cannot catch TPU-only failure modes: Mosaic
lowering gaps, default-precision bf16 matmuls (see the ops/fft.py fix),
unsupported dtype transfers.  This script drives the real surfaces on
the chip and checks numerics.  Usage:

    python tools/tpu_smoke.py [--quick]

Each check prints PASS/FAIL; exit code 0 iff all pass.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RATE_IN, RATE_OUT = 2_048_000.0, 1_488_375.0
RESULTS: list[tuple[str, bool, str]] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    RESULTS.append((name, bool(ok), detail))
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)


def skip(name: str, reason: str) -> None:
    """Known-backend-limitation skip: printed, not counted as a failure."""
    print(f"SKIP  {name}  {reason}", flush=True)


def tone_file(path: str, n: int, fmt: str = "cs16", f_hz: float = 100e3) -> None:
    # pure-numpy oracle quantizer: test INPUT generation must not depend on
    # the device under test (and a flaky axon client must not be able to
    # crash the sweep before the CLI checks even run)
    from tests import ref_dsp
    t = np.arange(n) / RATE_IN
    x = 0.5 * np.exp(2j * np.pi * f_hz * t).astype(np.complex64)
    ref_dsp.from_cf32(x, fmt).tofile(path)


def out_snr(path: str, fmt: str, rate: float, skip: int = 20000):
    """(peak_hz, snr_db); (nan, -inf) if analysis itself fails — a check
    then FAILs with a message instead of crashing the whole suite (a
    poisoned device client after an earlier failure must not stop the
    remaining checks)."""
    try:
        return _out_snr(path, fmt, rate, skip)
    except Exception as e:
        check("out_snr analysis", False, str(e)[:150])
        return float("nan"), float("-inf")


def _out_snr(path: str, fmt: str, rate: float, skip: int):
    from iq_tool_tpu.ops import convert
    from tests import ref_dsp
    raw = np.fromfile(path, convert.wire_dtype(fmt))
    # pure-numpy oracle conversion: independent of the device under test
    z = ref_dsp.to_cf32(raw, fmt)[skip:-4096 or None]
    w = np.hanning(len(z))
    p = np.abs(np.fft.fftshift(np.fft.fft(z * w))) ** 2
    f = np.fft.fftshift(np.fft.fftfreq(len(z), 1 / rate))
    k = int(np.argmax(p))
    sig = p[max(0, k - 200):k + 200].sum()
    return f[k], 10 * np.log10(sig / max(p.sum() - sig, 1e-30))


def run_cli(args: list[str]) -> int:
    try:
        return subprocess.run(
            [sys.executable, "-m", "iq_tool_tpu", *args],
            cwd=os.path.join(os.path.dirname(__file__), ".."),
            capture_output=True, text=True, timeout=560).returncode
    except subprocess.TimeoutExpired:
        return -9   # report as a failing check, not a crashed suite


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="flagship config only (skip the format sweep)")
    opts = ap.parse_args()

    import jax
    check("backend is not cpu", jax.default_backend() != "cpu",
          jax.default_backend())

    tmp = tempfile.mkdtemp(prefix="iq_smoke_")
    src = os.path.join(tmp, "tone.raw")
    tone_file(src, 1 << 18)

    # flagship chain: dc + shift + resample + lowpass
    dst = os.path.join(tmp, "out.raw")
    rc = run_cli([src, dst, "--input", "raw-file", "--output", "raw",
                  "--raw-file-input-rate", str(int(RATE_IN)),
                  "--raw-file-input-sample-format", "cs16",
                  "--output-rate", str(RATE_OUT),
                  "--output-sample-format", "cs16",
                  "--dc-block", "--freq-shift", "-50e3",
                  "--lowpass", "400000", "--force-overwrite"])
    ok = rc == 0
    if ok:
        peak, snr = out_snr(dst, "cs16", RATE_OUT)
        ok = abs(peak - 50e3) < 100 and snr > 60
        check("flagship chain (dc+shift+resample+lowpass)", ok,
              f"peak {peak/1e3:.1f} kHz snr {snr:.1f} dB")
    else:
        check("flagship chain (dc+shift+resample+lowpass)", False,
              f"cli rc={rc}")

    # fused overlap-save kernel at bench framing: the CLI-default block
    # (n_out 11907 < advance 12288) never reaches the 3/4-window-advance
    # Pallas path, so validate it directly — on-device kernel output
    # (incl. the ragged re-anchored tail) vs a float64 host oracle
    try:
        from iq_tool_tpu.ops import filters as _filters
        rng = np.random.default_rng(0)
        taps = rng.standard_normal(2175).astype(np.complex64)
        taps /= np.abs(taps).sum()
        sf = _filters.StreamingFilter(taps, "fft")
        b = sf.block
        n = 3 * b + 5000                      # 2 windows at adv 3b/2 + tail
        xr = rng.standard_normal((8, n)).astype(np.float32)
        xi = rng.standard_normal((8, n)).astype(np.float32)
        st = (rng.standard_normal((8, b)).astype(np.float32),
              rng.standard_normal((8, b)).astype(np.float32))
        run = jax.jit(lambda a, c, d, e: sf.apply_planar(a, c, d, e)[:2])
        gr, gi = jax.device_get(run(xr, xi, *st))
        ext = (np.concatenate([st[0], xr], -1)
               + 1j * np.concatenate([st[1], xi], -1)).astype(np.complex128)
        h128 = np.fft.ifft(np.asarray(sf._h).astype(np.complex128))
        L = 1 << int(np.ceil(np.log2(ext.shape[-1] + sf.nfft)))
        ref = np.fft.ifft(np.fft.fft(ext, L, axis=-1)
                          * np.fft.fft(h128, L), axis=-1)[:, b:b + n]
        err = float(np.max(np.abs((gr + 1j * gi) - ref)))
        check("osfft 3/4-advance kernel vs host oracle", err < 2e-3,
              f"max abs err {err:.2e}")
    except Exception as e:
        check("osfft 3/4-advance kernel vs host oracle", False,
              str(e)[:200])

    # mixed advance schedule at the CLI framing (n_out = 11907 < 3b/2):
    # the 3/4 + half + ragged segments must agree with the host oracle
    try:
        from iq_tool_tpu.ops import filters as _filters
        rng = np.random.default_rng(5)
        taps = rng.standard_normal(2175).astype(np.complex64)
        taps /= np.abs(taps).sum()
        sf = _filters.StreamingFilter(taps, "fft")
        b = sf.block
        for n in (11907, 3 * b // 2 + b + 777):
            xr = rng.standard_normal((8, n)).astype(np.float32)
            xi = rng.standard_normal((8, n)).astype(np.float32)
            st = (rng.standard_normal((8, b)).astype(np.float32),
                  rng.standard_normal((8, b)).astype(np.float32))
            run = jax.jit(lambda a, c, d, e: sf.apply_planar(a, c, d, e)[:2])
            gr, gi = jax.device_get(run(xr, xi, *st))
            ext = (np.concatenate([st[0], xr], -1)
                   + 1j * np.concatenate([st[1], xi], -1)).astype(np.complex128)
            h128 = np.fft.ifft(np.asarray(sf._h).astype(np.complex128))
            L = 1 << int(np.ceil(np.log2(ext.shape[-1] + sf.nfft)))
            ref = np.fft.ifft(np.fft.fft(ext, L, axis=-1)
                              * np.fft.fft(h128, L), axis=-1)[:, b:b + n]
            err = float(np.max(np.abs((gr + 1j * gi) - ref)))
            if err >= 2e-3:
                break
        check("osfft mixed-advance schedule (CLI framing) vs oracle",
              err < 2e-3, f"max abs err {err:.2e}")
    except Exception as e:
        check("osfft mixed-advance schedule (CLI framing) vs oracle",
              False, str(e)[:200])

    # wire-input DC kernel: packed int32 cs16 de-interleave in-register
    # vs the planar-input kernel (bitwise at gain 1)
    try:
        from iq_tool_tpu.ops import convert as _conv
        from iq_tool_tpu.ops import pallas_kernels as _pk
        import jax.numpy as _jnp
        rng = np.random.default_rng(9)
        n = 16384
        raw = rng.integers(-2 ** 15, 2 ** 15, (8, 2 * n)).astype(np.int16)
        xr, xi = _conv.to_planar(_jnp.asarray(raw), "cs16", 1.0)
        st = np.zeros((8, 4), np.float32)
        alpha = 2 * np.pi * 10.0 / RATE_IN
        want = _pk.dc_block_apply(xr, xi, _jnp.asarray(st), alpha)
        wire = jax.lax.bitcast_convert_type(
            _jnp.asarray(raw).reshape(8, n, 2), _jnp.int32)
        got = _pk.dc_block_apply(None, None, _jnp.asarray(st), alpha,
                                 wire_i32=wire, wire_norm=1.0 / 32768.0)
        if got is None or want is None:
            check("wire-input DC kernel == planar kernel", False,
                  "kernel declined")
        else:
            md = max(float(np.abs(np.asarray(g) - np.asarray(w)).max())
                     for g, w in zip(got, want))
            check("wire-input DC kernel == planar kernel", md == 0.0,
                  f"max abs diff {md:.2e}")
    except Exception as e:
        check("wire-input DC kernel == planar kernel", False, str(e)[:200])

    # 8-bit wire decode (round 4): the int16-packed cu8/cs8 wire
    # de-interleaved in-register vs the planar kernel — proves int16
    # VMEM refs + byte shifts lower on real Mosaic (RTL-SDR / HackRF
    # native formats)
    for _fmt8, _dt8, _lo8, _hi8 in (("cu8", np.uint8, 0, 256),
                                    ("cs8", np.int8, -128, 128)):
        try:
            from iq_tool_tpu.formats import get_format as _getf
            from iq_tool_tpu.ops import convert as _conv
            from iq_tool_tpu.ops import pallas_kernels as _pk
            import jax.numpy as _jnp
            rng = np.random.default_rng(11)
            n = 16384
            raw = rng.integers(_lo8, _hi8, (8, 2 * n)).astype(_dt8)
            xr, xi = _conv.to_planar(_jnp.asarray(raw), _fmt8, 1.0)
            st = np.zeros((8, 4), np.float32)
            alpha = 2 * np.pi * 10.0 / RATE_IN
            want = _pk.dc_block_apply(xr, xi, _jnp.asarray(st), alpha)
            wire, kind = _conv.wire_pack(_jnp.asarray(raw), _fmt8)
            got = _pk.dc_block_apply(
                None, None, _jnp.asarray(st), alpha, wire_i32=wire,
                wire_norm=_getf(_fmt8).normalizer, wire_kind=kind)
            if got is None or want is None:
                check(f"{_fmt8} wire DC kernel == planar kernel", False,
                      "kernel declined")
            else:
                md = max(float(np.abs(np.asarray(g) - np.asarray(w)).max())
                         for g, w in zip(got, want))
                check(f"{_fmt8} wire DC kernel == planar kernel", md == 0.0,
                      f"max abs diff {md:.2e}")
        except Exception as e:
            check(f"{_fmt8} wire DC kernel == planar kernel", False,
                  str(e)[:200])

    # packed-output banded epilogue: last resampler stage quantizing
    # straight to the cs16 wire vs planar + convert (bitwise)
    try:
        from iq_tool_tpu.ops import convert as _conv
        from iq_tool_tpu.ops import pallas_kernels as _pk
        import jax.numpy as _jnp
        rng = np.random.default_rng(13)
        stride, hist, g, nb, ch = 512, 23, 441, 8, 8
        n = nb * stride
        xr = (rng.standard_normal((ch, n)) * 0.3).astype(np.float32)
        xi = (rng.standard_normal((ch, n)) * 0.3).astype(np.float32)
        sr = rng.standard_normal((ch, hist)).astype(np.float32)
        si = rng.standard_normal((ch, hist)).astype(np.float32)
        a_r = (rng.standard_normal((stride + hist, g)) * 0.05
               ).astype(np.float32)
        yr, yi = _pk.banded_apply(sr, si, xr, xi, a_r, None, stride, hist)
        want = np.asarray(_conv.from_planar(yr, yi, "cs16"))
        wire_i32 = _pk.banded_apply(sr, si, xr, xi, a_r, None, stride,
                                    hist, pack_fmt="cs16")
        got = np.asarray(jax.lax.bitcast_convert_type(
            wire_i32, _jnp.int16)).reshape(ch, -1)
        d = np.abs(got.astype(np.int32) - want.astype(np.int32))
        check("banded pack-cs16 epilogue == planar + convert",
              bool(d.max() == 0), f"maxdiff {d.max()}")
    except Exception as e:
        check("banded pack-cs16 epilogue == planar + convert", False,
              str(e)[:200])

    # wire-INPUT twin: stage decodes the packed cs16 wire in-register
    try:
        from iq_tool_tpu.ops import convert as _conv
        from iq_tool_tpu.ops import pallas_kernels as _pk
        import jax.numpy as _jnp
        rng = np.random.default_rng(14)
        stride, hist, ch = 512, 23, 8
        n = 8 * stride
        a_r = (rng.standard_normal((stride + hist, 441)) * 0.05
               ).astype(np.float32)
        sr = rng.standard_normal((ch, hist)).astype(np.float32)
        si = rng.standard_normal((ch, hist)).astype(np.float32)
        raw16 = rng.integers(-2 ** 15, 2 ** 15, (ch, 2 * n)).astype(np.int16)
        xr2, xi2 = _conv.to_planar(_jnp.asarray(raw16), "cs16", 1.0)
        wr, wi = _pk.banded_apply(sr, si, xr2, xi2, a_r, None, stride, hist)
        wire_in = jax.lax.bitcast_convert_type(
            _jnp.asarray(raw16).reshape(ch, n, 2), _jnp.int32)
        gr, gi = _pk.banded_apply(sr, si, None, None, a_r, None, stride,
                                  hist, wire_i32=wire_in,
                                  wire_norm=1.0 / 32768.0)
        md = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in ((gr, wr), (gi, wi)))
        check("banded wire-input == planar input", md == 0.0,
              f"max abs diff {md:.2e}")
    except Exception as e:
        check("banded wire-input == planar input", False, str(e)[:200])

    # DC-fused banded stage 0 (wire decode + DC recurrence + NCO in the
    # kernel prologue, banded_apply_dc) vs the fused-pre + wire-stage0
    # path on the SAME silicon — shared _dc_plane_tile/_nco_mix_base, so
    # the bound is quantization-level
    try:
        from iq_tool_tpu.ops.fir_design import FilterRequest as _FR
        from iq_tool_tpu.pipeline import chain as _chain_mod
        from iq_tool_tpu.pipeline.chain import Chain as _Chain
        from iq_tool_tpu.pipeline.chain import ChainConfig as _CC
        rng = np.random.default_rng(15)
        _cfg = _CC(input_format="cs16", output_format="cs16",
                   input_rate=RATE_IN, target_rate=RATE_OUT,
                   dc_block=True, freq_shift_pre_hz=100e3,
                   filters=[_FR("lowpass", 400e3)], target_block=16384)
        _raws = [rng.integers(-2 ** 14, 2 ** 14,
                              (1, _Chain(_cfg).in_wire_len))
                 .astype(np.int16) for _ in range(2)]

        def _run_cfg():
            c = _Chain(_cfg)
            cy = c.init_carry()
            outs = []
            for r in _raws:
                cy, o = c.step(cy, r, np.bool_(False))
                outs.append(np.asarray(jax.device_get(o)))
            return np.concatenate(outs, -1)

        got = _run_cfg()
        os.environ["IQTOOL_DISABLE_DC_STAGE0"] = "1"
        try:
            want = _run_cfg()
        finally:
            del os.environ["IQTOOL_DISABLE_DC_STAGE0"]
        d = np.abs(got.astype(np.int32) - want.astype(np.int32))
        check("dc-fused banded stage 0 == fused-pre + wire stage 0",
              bool(d.max() <= 1), f"maxdiff {d.max()} codes")
    except Exception as e:
        check("dc-fused banded stage 0 == fused-pre + wire stage 0",
              False, str(e)[:200])

    # fused post-stage kernel (NCO + AGC gains + cs16 quantize/interleave)
    # vs the separate XLA ops, incl. ragged n and the int32 packing
    try:
        from iq_tool_tpu.ops import convert as _conv
        from iq_tool_tpu.ops import nco as _nco
        from iq_tool_tpu.ops import pallas_kernels as _pk
        import jax.numpy as _jnp
        rng = np.random.default_rng(7)
        n = 11907
        xr = (rng.standard_normal((8, n)) * 0.4).astype(np.float32)
        xi = (rng.standard_normal((8, n)) * 0.4).astype(np.float32)
        gains = rng.uniform(0.5, 2.0, (8, n // 128)).astype(np.float32)
        pacc = rng.integers(0, 2 ** 32, (8, 1), dtype=np.uint32)
        dth = 123456789
        got_i32 = _pk.post_apply(_jnp.asarray(xr), _jnp.asarray(xi),
                                 _jnp.asarray(gains), 128,
                                 _jnp.asarray(pacc), dth)
        if got_i32 is None:
            check("fused post kernel vs XLA ops", False, "kernel declined")
        else:
            got = np.asarray(jax.lax.bitcast_convert_type(
                got_i32, _jnp.int16)).reshape(8, 2 * n)
            yr, yi, _ = _nco.apply_planar(_jnp.asarray(xr),
                                          _jnp.asarray(xi),
                                          _jnp.asarray(pacc[:, 0]),
                                          np.uint32(dth))
            g_full = np.repeat(gains, 128, axis=-1)
            pad = np.repeat(gains[:, -1:], n - g_full.shape[-1], axis=-1)
            g_full = np.concatenate([g_full, pad], axis=-1)
            want = np.asarray(_conv.from_planar(yr * g_full, yi * g_full,
                                                "cs16"))
            d = np.abs(got.astype(np.int32) - want.astype(np.int32))
            check("fused post kernel vs XLA ops",
                  bool(d.max() <= 1 and (d != 0).mean() < 2e-3),
                  f"maxdiff {d.max()} frac {(d != 0).mean():.4f}")
    except Exception as e:
        check("fused post kernel vs XLA ops", False, str(e)[:200])

    # single-stream sublane folding: FoldedChain(F=8) vs the sequential
    # row-block chain on the real chip (Mosaic lowering of the folded
    # fused pre-stage + row-batched banded stages)
    try:
        from iq_tool_tpu.ops.fir_design import FilterRequest
        from iq_tool_tpu.pipeline.chain import Chain, ChainConfig
        from iq_tool_tpu.pipeline.folded import FoldedChain
        fcfg = ChainConfig(
            input_format="cs16", output_format="cs16",
            input_rate=RATE_IN, target_rate=RATE_OUT,
            dc_block=True, freq_shift_pre_hz=100e3,
            filters=(FilterRequest("lowpass", 400e3),),
            agc_profile="local", target_block=16384)
        fc = FoldedChain(fcfg, fold=8)
        seq = Chain(fcfg)
        rng = np.random.default_rng(11)
        raws = [rng.integers(-2 ** 14, 2 ** 14, (1, fc.in_wire_len))
                .astype(np.int16) for _ in range(2)]
        ca = fc.init_carry()
        outs_a = []
        for r in raws:
            ca, oa = fc.step(ca, r, np.bool_(False))
            outs_a.append(np.asarray(jax.device_get(oa)))
        cb = seq.init_carry(1)
        outs_b = []
        w = seq.in_wire_len
        for r in raws:
            for j in range(8):
                cb, ob = seq.step(cb, r[:, j * w:(j + 1) * w], np.bool_(False))
                outs_b.append(np.asarray(jax.device_get(ob)))
        a = np.concatenate(outs_a, -1).astype(np.float64)
        bb = np.concatenate(outs_b, -1).astype(np.float64)
        d = np.abs(a - bb)
        snr = 10 * np.log10((bb ** 2).mean() / ((d ** 2).mean() + 1e-30))
        check("folded chain (F=8) == sequential row chain",
              bool(snr > 60 and d.max() <= 32),
              f"snr {snr:.1f} dB maxdiff {d.max():.0f} codes")
    except Exception as e:
        check("folded chain (F=8) == sequential row chain", False,
              str(e)[:200])

    # sharded step on the real chip (1-device mesh): exercises the FUSED
    # Pallas pre-stage on the sharded path (zero-start kernel + linear
    # prefix correction) against the plain chain
    try:
        from iq_tool_tpu.ops.fir_design import FilterRequest
        from iq_tool_tpu.parallel.sharded import ShardedChain, make_mesh
        from iq_tool_tpu.pipeline.chain import Chain, ChainConfig
        cfg = ChainConfig(
            input_format="cs16", output_format="cs16",
            input_rate=RATE_IN, target_rate=RATE_OUT,
            dc_block=True, iq_correction=True,
            freq_shift_pre_hz=100e3,
            filters=(FilterRequest("lowpass", 400e3),),
            target_block=16384)
        mesh = make_mesh(jax.devices()[:1], 1, 1)
        sc = ShardedChain(cfg, mesh)
        plain = Chain(ChainConfig(**{**cfg.__dict__,
                                     "target_block": sc.local.cfg
                                     .target_block}))
        rng = np.random.default_rng(3)
        raws = [rng.integers(-2 ** 14, 2 ** 14, (1, sc.n_in * 2))
                .astype(np.int16) for _ in range(2)]
        ca, cb = sc.init_carry(), plain.init_carry(1)
        outs_a, outs_b = [], []
        for r in raws:
            ca, oa = sc.step(ca, r, np.bool_(False))
            cb, ob = plain.step(cb, r, np.bool_(False))
            outs_a.append(np.asarray(jax.device_get(oa)))
            outs_b.append(np.asarray(jax.device_get(ob)))
        a = np.concatenate(outs_a, -1).astype(np.float64)
        b = np.concatenate(outs_b, -1).astype(np.float64)
        d = np.abs(a - b)
        snr = 10 * np.log10((b ** 2).mean() / ((d ** 2).mean() + 1e-30))
        check("sharded fused pre-stage == plain chain",
              bool(snr > 70 and d.max() <= 4),
              f"snr {snr:.1f} dB maxdiff {d.max():.0f} codes")
    except Exception as e:
        # Round 4 resolved the long-standing "axon sharded rejection":
        # the poison was an EAGER complex64 zeros in _carry_struct
        # (unimplemented per-op program that kills every later compile
        # in the process), fixed via jax.eval_shape — this check now
        # PASSES on silicon (docs/PERF.md).  Any UNIMPLEMENTED here is
        # a real failure again.
        check("sharded fused pre-stage == plain chain", False,
              str(e)[:200])

    # sharded WIRE-FUSED stage 0 on the real chip (round 4): the
    # flagship shape (dc + shift + resample, no iq) rides
    # banded_apply_dc per shard with the z·E / W_head / ppermute
    # stitch, and the last stage packs to the wire in its epilogue
    # (parallel/sharded.py _wire_stage0_dc) — verify vs the plain chain
    try:
        from iq_tool_tpu.ops.fir_design import FilterRequest
        from iq_tool_tpu.parallel.sharded import ShardedChain, make_mesh
        from iq_tool_tpu.pipeline.chain import Chain, ChainConfig
        cfg = ChainConfig(
            input_format="cs16", output_format="cs16",
            input_rate=RATE_IN, target_rate=RATE_OUT,
            dc_block=True, freq_shift_pre_hz=100e3,
            filters=(FilterRequest("lowpass", 400e3),),
            target_block=16384)
        mesh = make_mesh(jax.devices()[:1], 1, 1)
        sc = ShardedChain(cfg, mesh)
        plain = Chain(ChainConfig(**{**cfg.__dict__,
                                     "target_block": sc.local.cfg
                                     .target_block}))
        from iq_tool_tpu.ops import pallas_kernels as _pk
        st0 = sc.local.resampler.stages[0]
        engaged = _pk.plan(st0.stride, st0.hist, st0._a.shape[1],
                           sc.local.n_in // st0.stride, 1,
                           dc=True) is not None
        rng = np.random.default_rng(5)
        raws = [rng.integers(-2 ** 14, 2 ** 14, (1, sc.n_in * 2))
                .astype(np.int16) for _ in range(2)]
        ca, cb = sc.init_carry(), plain.init_carry(1)
        outs_a, outs_b = [], []
        for r in raws:
            ca, oa = sc.step(ca, r, np.bool_(False))
            cb, ob = plain.step(cb, r, np.bool_(False))
            outs_a.append(np.asarray(jax.device_get(oa)))
            outs_b.append(np.asarray(jax.device_get(ob)))
        a = np.concatenate(outs_a, -1).astype(np.float64)
        b = np.concatenate(outs_b, -1).astype(np.float64)
        d = np.abs(a - b)
        snr = 10 * np.log10((b ** 2).mean() / ((d ** 2).mean() + 1e-30))
        check("sharded wire-fused stage 0 == plain chain",
              bool(engaged and snr > 70 and d.max() <= 4),
              f"engaged {engaged} snr {snr:.1f} dB "
              f"maxdiff {d.max():.0f} codes")
    except Exception as e:
        check("sharded wire-fused stage 0 == plain chain", False,
              str(e)[:200])

    # config #4: iq + pass-range + notch + AGC (exercises the FFT filter
    # path and the complex-tap machinery — this caught the DEFAULT-
    # precision matmul-FFT bug)
    dst4 = os.path.join(tmp, "out4.raw")
    rc = run_cli([src, dst4, "--input", "raw-file", "--output", "raw",
                  "--raw-file-input-rate", str(int(RATE_IN)),
                  "--raw-file-input-sample-format", "cs16",
                  "--output-rate", str(RATE_OUT),
                  "--output-sample-format", "cs16",
                  "--dc-block", "--iq-correction", "--freq-shift", "-50e3",
                  "--pass-range", "20e3:120e3", "--stopband-2", "-5e3:5e3",
                  "--output-agc", "--agc-profile", "digital",
                  "--force-overwrite"])
    ok = rc == 0
    if ok:
        peak, snr = out_snr(dst4, "cs16", RATE_OUT, skip=60000)
        ok = abs(peak - 50e3) < 100 and snr > 60
        check("full chain (iq+pass-range+notch+AGC)", ok,
              f"peak {peak/1e3:.1f} kHz snr {snr:.1f} dB")
    else:
        check("full chain (iq+pass-range+notch+AGC)", False, f"cli rc={rc}")

    if not opts.quick:
        # WAV in (SDR#-style filename metadata) -> RF64 out
        import struct
        wav_in = os.path.join(tmp, "SDRSharp_20260101_000000Z_98500000Hz_IQ.wav")
        n = 1 << 17
        t = np.arange(n) / RATE_IN
        x = 0.4 * np.exp(2j * np.pi * 150e3 * t)
        iq = np.empty((n, 2), np.int16)
        iq[:, 0] = np.round(x.real * 32767)
        iq[:, 1] = np.round(x.imag * 32767)
        data = iq.tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, int(RATE_IN),
                                     int(RATE_IN) * 4, 4, 16)
        hdr += b"data" + struct.pack("<I", len(data))
        with open(wav_in, "wb") as f:
            f.write(hdr + data)
        wav_out = os.path.join(tmp, "out.wav")
        rc = run_cli([wav_in, wav_out, "-i", "wav", "-o", "wav",
                      "--output-rate", str(RATE_OUT),
                      "--lowpass", "400000", "--force-overwrite"])
        ok = rc == 0 and open(wav_out, "rb").read(4) == b"RF64"
        check("wav -> rf64", ok, f"rc={rc}")

        # synthetic SDR source through the buffered IQPK capture path
        tone_out = os.path.join(tmp, "tone_out.raw")
        rc = run_cli(["/dev/null", tone_out, "-i", "tone", "-o", "raw",
                      "--tone-rate", str(int(RATE_IN)),
                      "--tone-freq", "200e3", "--tone-seconds", "0.25",
                      "--tone-format", "cu8",
                      "--output-rate", str(RATE_OUT),
                      "--output-sample-format", "cs16",
                      "--lowpass", "400000", "--sdr-buffered",
                      "--no-watchdog", "--force-overwrite"])
        check("tone source, buffered IQPK capture", rc == 0, f"rc={rc}")

        from iq_tool_tpu.formats import complex_formats
        floors = {"cu8": 38.0, "cs8": 38.0, "sc16q11": 60.0}
        for fmt in complex_formats():
            fsrc = os.path.join(tmp, f"tone_{fmt}.raw")
            fdst = os.path.join(tmp, f"out_{fmt}.raw")
            tone_file(fsrc, 1 << 18, fmt)
            rc = run_cli([fsrc, fdst, "--input", "raw-file", "--output", "raw",
                          "--raw-file-input-rate", str(int(RATE_IN)),
                          "--raw-file-input-sample-format", fmt,
                          "--output-rate", str(RATE_OUT),
                          "--output-sample-format", fmt,
                          "--lowpass", "400000", "--force-overwrite"])
            if rc:
                check(f"format {fmt}", False, f"cli rc={rc}")
                continue
            peak, snr = out_snr(fdst, fmt, RATE_OUT)
            floor = floors.get(fmt, 65.0)
            check(f"format {fmt}", abs(peak - 100e3) < 100 and snr > floor,
                  f"snr {snr:.1f} dB (floor {floor})")

    failed = [n for n, ok, _ in RESULTS if not ok]
    print(f"\n{len(RESULTS) - len(failed)}/{len(RESULTS)} passed"
          + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
