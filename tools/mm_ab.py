"""A/B the trace-time Pallas kernel knobs on the real chip.

Two knobs (both read at TRACE time, switched via the supported setters
in ops.pallas_kernels — rebuild chains after switching):

  * ``set_mm_terms(3|2|1)`` — bf16 split terms in the banded/osfft
    matmuls.  3 = hi@A_hi + lo@A_hi + hi@A_lo (~88 dB); 2 drops the
    A_lo term (the whole residual is the bf16 rounding of the TAPS — a
    deterministic LTI response perturbation); 1 is a perf probe only.
  * ``set_nco_tables(bool)`` — host-precomputed per-lane cos/sin rows
    for the in-kernel NCO mix (one (2, width) VMEM constant instead of
    2*width transcendentals per tile).

For each setting this tool measures

  1. end-to-end tone SNR through the five BASELINE configs (Chain
     driven wire->wire on the device, FFT-peak SNR on the decoded
     output — same estimator as tools/tpu_smoke.py), and
  2. steady-state throughput on the MXU-bound configs (#1 and the
     flagship), bench.py's two-scan-length methodology.

The gate for changing the default term count is the reference's
resampler quality contract — 60 dB stop-band attenuation
(reference constants.h:137, resampler.c:27): every cs16 config must
keep measured tone SNR >= 60 dB with margin, and the cu8 config
(quantization-floor limited to ~48 dB) must stay within 1 dB of the
3-term measurement.

    python tools/mm_ab.py [--channels N] [--block N]
                          [--settings 3t,2t,1t,3t-notab] [--snr-only]

Prints one JSON line per (setting, measurement).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import bench_all  # noqa: E402

IN_RATE, OUT_RATE = bench_all.IN_RATE, bench_all.OUT_RATE

# name -> (mm_terms, nco_tables)
SETTINGS = {
    "3t": (3, True),
    "2t": (2, True),
    "1t": (1, True),
    "3t-notab": (3, False),
    "2t-notab": (2, False),
}


def _apply(setting: str) -> None:
    from iq_tool_tpu.ops import pallas_kernels as pk
    terms, tables = SETTINGS[setting]
    pk.set_mm_terms(terms)
    pk.set_nco_tables(tables)


def _fft_peak_snr(z: np.ndarray, skip: int = 16384) -> float:
    """Tone SNR via windowed FFT peak (+/-200 bins = signal)."""
    z = z[skip:]
    w = np.hanning(len(z))
    p = np.abs(np.fft.fft(z * w)) ** 2
    k = int(np.argmax(p))
    lo, hi = max(0, k - 200), min(len(p), k + 200)
    sig = p[lo:hi].sum()
    return 10 * np.log10(sig / max(p.sum() - sig, 1e-30))


def measure_snr(cfg, f_tone: float = 100e3, n_blocks: int = 6) -> float:
    """Drive a tone wire->wire through a fresh Chain (1 channel) on the
    device and return the output tone SNR in dB."""
    import dataclasses

    from tests import ref_dsp
    from iq_tool_tpu.pipeline.chain import Chain

    cfg = dataclasses.replace(cfg, channels=1, target_block=1 << 16)
    chain = Chain(cfg)
    n = chain.n_in * n_blocks
    t = np.arange(n) / cfg.input_rate
    amp = 0.45 if cfg.input_format == "cu8" else 0.5
    z = (amp * np.exp(2j * np.pi * f_tone * t)).astype(np.complex64)
    wire = np.asarray(ref_dsp.from_cf32(z, cfg.input_format))

    carry = chain.init_carry()
    outs = []
    for b in range(n_blocks):
        blk = wire[b * chain.in_wire_len:(b + 1) * chain.in_wire_len]
        carry, out = chain.step(carry, blk[None, :], np.False_)
        outs.append(np.asarray(out)[0])
    y = ref_dsp.to_cf32(np.concatenate(outs), cfg.output_format)
    return _fft_peak_snr(y)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--block", type=int, default=1 << 18)
    ap.add_argument("--settings", default="3t,2t")
    ap.add_argument("--snr-only", action="store_true")
    ap.add_argument("--perf-only", action="store_true")
    opts = ap.parse_args()

    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline.chain import ChainConfig

    snr_configs = bench_all.make_configs(1, 1 << 16)
    flagship = ChainConfig(
        input_format="cs16", output_format="cs16",
        input_rate=IN_RATE, target_rate=OUT_RATE,
        channels=opts.channels, dc_block=True,
        freq_shift_pre_hz=100_000.0,
        filters=(FilterRequest("lowpass", 400_000.0),),
        target_block=opts.block)
    perf_configs = {
        "1_raw_resample": bench_all.make_configs(
            opts.channels, opts.block)["1: raw cs16 -> resample -> cs16"],
        "flagship": flagship,
    }

    for setting in opts.settings.split(","):
        _apply(setting)
        if not opts.perf_only:
            for name, cfg in snr_configs.items():
                try:
                    snr = measure_snr(cfg)
                    print(json.dumps({"setting": setting, "config": name,
                                      "snr_db": round(snr, 2)}), flush=True)
                except Exception as e:
                    print(json.dumps({"setting": setting, "config": name,
                                      "error": str(e)[:200]}), flush=True)
        if not opts.snr_only:
            for name, cfg in perf_configs.items():
                try:
                    msps = bench_all.measure(cfg, cfg.channels)
                    print(json.dumps({"setting": setting, "config": name,
                                      "Msps_in": round(msps, 1)}),
                          flush=True)
                except Exception as e:
                    print(json.dumps({"setting": setting, "config": name,
                                      "error": str(e)[:200]}), flush=True)
    _apply("3t")   # restore defaults
    return 0


if __name__ == "__main__":
    sys.exit(main())
