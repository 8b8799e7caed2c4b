"""Long-stream stability check (the reference's long-duration proof-point
analog, main.c:19-25): generate N seconds of cs16 tone, stream it through
the flagship chain with periodic checkpoints, verify exact frame
accounting and that the tone is intact (no drift / state decay) in the
final window.

    python tools/endurance.py [--seconds 40]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FS_IN, FS_OUT = 2_048_000, 1_488_375.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=40)
    opts = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="iq_endurance_")
    src = os.path.join(tmp, "tone.raw")
    n = FS_IN * opts.seconds
    t = np.arange(n, dtype=np.float64) / FS_IN
    x = 0.5 * np.exp(2j * np.pi * 100e3 * t)
    iq = np.empty(2 * n, np.int16)
    iq[0::2] = np.round(x.real * 32768).clip(-32768, 32767)
    iq[1::2] = np.round(x.imag * 32768).clip(-32768, 32767)
    iq.tofile(src)

    dst = os.path.join(tmp, "out.raw")
    r = subprocess.run(
        [sys.executable, "-m", "iq_tool_tpu", src, dst,
         "--input", "raw-file", "--output", "raw",
         "--raw-file-input-rate", str(FS_IN),
         "--raw-file-input-sample-format", "cs16",
         "--output-rate", str(FS_OUT), "--output-sample-format", "cs16",
         "--lowpass", "400000", "--dc-block",
         "--block-size", "262144", "--pipeline-depth", "8",
         "--checkpoint", os.path.join(tmp, "state.ckpt"),
         "--force-overwrite"],
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    if r.returncode:
        print("FAIL: cli rc", r.returncode)
        return 1

    raw = np.fromfile(dst, np.int16)
    expect = n * 11907 // 16384
    if len(raw) != 2 * expect:
        print(f"FAIL: {len(raw)//2} frames out, expected {expect}")
        return 1
    tail = raw[-2 * (1 << 20):].astype(np.float64) / 32768.0
    z = tail[0::2] + 1j * tail[1::2]
    if not np.isfinite(z).all():
        print("FAIL: non-finite samples in the final window")
        return 1
    w = np.hanning(len(z))
    p = np.abs(np.fft.fftshift(np.fft.fft(z * w))) ** 2
    f = np.fft.fftshift(np.fft.fftfreq(len(z), 1 / FS_OUT))
    k = int(np.argmax(p))
    sig = p[max(0, k - 200):k + 200].sum()
    snr = 10 * np.log10(sig / max(p.sum() - sig, 1e-30))
    ok = abs(f[k] - 100e3) < 50 and snr > 60
    print(f"{'PASS' if ok else 'FAIL'}: {expect} frames exact, final-window "
          f"peak {f[k]/1e3:.2f} kHz, SNR {snr:.1f} dB")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
