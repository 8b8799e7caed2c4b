"""CLI option-combination fuzz: random VALID flag sets, end-to-end.

Drives `cli.main` in-process on small streams, asserting rc == 0 and the
exact expected output frame count for every sampled combination of
format / rate / filter-chain / AGC / shift / block-size options.  This
covers the config-resolution and validation seams (reference
config.c:66-399) at CLI level, beyond the fixed configs in the test
suite.

    python tools/cli_fuzz.py [--n 60] [--seed 0]

Exit code 0 = all combinations passed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

FORMATS_IN = ["cu8", "cs8", "cs16", "cf32", "sc16q11", "cs24"]
FORMATS_OUT = ["cu8", "cs16", "cf32", "cs24"]
RATES = [(2_048_000, 1_488_375), (2_048_000, 1_024_000),
         (1_000_000, 2_000_000), (912_000, 912_000)]


def one_case(rng: np.random.Generator, idx: int) -> dict:
    from iq_tool_tpu import cli
    from iq_tool_tpu.formats import get_format

    fin = rng.choice(FORMATS_IN)
    fout = rng.choice(FORMATS_OUT)
    rate_in, rate_out = RATES[rng.integers(len(RATES))]
    n = int(rng.integers(20_000, 120_000))
    fmt = get_format(fin)

    # 20% raw-garbage bytes (robustness: must not crash, exact frame
    # accounting still holds); otherwise sane-amplitude noise via the
    # oracle converter — required for the float-tolerance equivalence
    # modes below (garbage sc16q11 decodes to 16x over-range, where
    # everything clips and re-association noise scales with the RMS).
    sane = rng.random() >= 0.2
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in.raw")
        dst = os.path.join(tmp, "out.raw")

        def gen_payload():
            if not sane:
                return rng.integers(0, 256, n * fmt.bytes_per_frame,
                                    dtype=np.uint8)
            from tests import ref_dsp
            x = (0.35 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
                 / np.sqrt(2)).astype(np.complex64)
            return np.frombuffer(ref_dsp.from_cf32(x, fin).tobytes(),
                                 np.uint8)

        payload = gen_payload()
        payload.tofile(src)

        args = [src, dst, "-i", "raw-file", "-o", "raw",
                "--raw-file-input-rate", str(rate_in),
                "--raw-file-input-sample-format", fin,
                "--output-rate", str(rate_out),
                "--output-sample-format", fout,
                "--force-overwrite", "--log-level", "error"]
        opts = {"rate": (rate_in, rate_out), "fin": fin, "fout": fout,
                "n": n}
        if rng.random() < 0.5:
            args += ["--dc-block"]
            opts["dc"] = 1
        if rng.random() < 0.25:
            args += ["--dc-block", "--iq-correction"]
            opts["iq"] = 1
        if rng.random() < 0.5:
            shift = float(rng.integers(-200, 200)) * 1e3
            args += ["--freq-shift", str(shift)]
            opts["shift"] = shift
        nyq = min(rate_in, rate_out) / 2
        nfilt = int(rng.integers(0, 3))
        kinds = ["--lowpass", "--highpass", "--pass-range", "--stopband"]
        for k in range(nfilt):
            sfx = "" if k == 0 else f"-{k + 1}"
            kind = kinds[rng.integers(len(kinds))]
            if kind in ("--lowpass", "--highpass"):
                f = float(rng.integers(10, int(nyq * 0.7 / 1e3))) * 1e3
                args += [kind + sfx, str(f)]
            else:
                lo = float(rng.integers(-int(nyq * 0.3 / 1e3),
                                        int(nyq * 0.2 / 1e3))) * 1e3
                hi = lo + float(rng.integers(10, 100)) * 1e3
                hi = min(hi, nyq * 0.8)
                if hi - lo < 5e3:
                    continue
                args += [kind + sfx, f"{lo}:{hi}"]
            opts[f"filt{k}"] = args[-2:]
        if rng.random() < 0.3:
            prof = ["dx", "local", "digital"][rng.integers(3)]
            args += ["--output-agc", "--agc-profile", prof]
            opts["agc"] = prof
        if rng.random() < 0.3:
            args += ["--block-size", str(int(2 ** rng.integers(13, 16)))]
        if rng.random() < 0.3:
            args += ["--pipeline-depth", str(int(rng.integers(1, 5)))]
        if rng.random() < 0.2 and rate_in == rate_out:
            # --no-resample conflicts with --output-rate (reference
            # config.c:256-399 validation): replace, don't combine
            i = args.index("--output-rate")
            del args[i:i + 2]
            args += ["--no-resample"]
            opts["no_resample"] = 1

        rc = cli.main(args)
        out_fmt = get_format(fout)
        got = os.path.getsize(dst) // out_fmt.bytes_per_frame if rc == 0 \
            else -1

        mode = rng.random()

        # multichannel-equivalence: the same config as a --channels 2
        # batch must match two independent single runs within 1 output
        # code (batching changes the matmul M dimension, which
        # re-associates XLA float reductions — test_multichannel.py).
        if rc == 0 and sane and 0.4 <= mode < 0.7 and fout in ("cu8", "cs16"):
            src_b = os.path.join(tmp, "in_b.raw")
            gen_payload().tofile(src_b)
            dst_b = os.path.join(tmp, "out_b.raw")
            rc_b = cli.main([src_b if x == src else dst_b if x == dst
                             else x for x in args])
            m0, m1 = os.path.join(tmp, "m0.raw"), os.path.join(tmp, "m1.raw")
            rc_m = cli.main([f"{src},{src_b}" if x == src
                             else f"{m0},{m1}" if x == dst else x
                             for x in args] + ["--channels", "2"])
            ok_mc = rc_b == 0 and rc_m == 0
            if ok_mc:
                wdt = np.int16 if fout == "cs16" else np.uint8
                stats = []
                for mpath, rpath in ((m0, dst), (m1, dst_b)):
                    a = np.fromfile(mpath, wdt).astype(np.int32)
                    b = np.fromfile(rpath, wdt).astype(np.int32)
                    d = np.abs(a - b) if a.shape == b.shape else None
                    if d is None or d.max() > 1 or (d != 0).mean() > 5e-3:
                        ok_mc = False
                    stats.append("shape" if d is None else
                                 f"max={int(d.max())} "
                                 f"frac={float((d != 0).mean()):.2}")
                opts["mc_stats"] = stats
            opts["multichannel"] = "ok" if ok_mc else "MISMATCH"
            if not ok_mc:
                return {"idx": idx, "ok": False, "rc": rc, "got": got,
                        "want": -3, "opts": opts}

        # WAV round-trip: same chain written as RF64, read back through
        # the WAV input module with --raw-passthrough — payload bytes
        # must equal the raw-output run exactly (writer + reader + header
        # framing across configs).
        if rc == 0 and 0.7 <= mode < 0.85 and fout in ("cs16", "cu8"):
            wav_out = os.path.join(tmp, "out.wav")
            wargs = list(args)
            wargs[wargs.index(dst)] = wav_out
            wargs[wargs.index("-o") + 1] = "wav"
            ok_wav = cli.main(wargs) == 0
            if ok_wav:
                rt = os.path.join(tmp, "roundtrip.raw")
                rc_r = cli.main([wav_out, rt, "-i", "wav", "-o", "raw",
                                 "--raw-passthrough",
                                 "--output-sample-format", fout,
                                 "--force-overwrite", "--log-level",
                                 "error"])
                ok_wav = (rc_r == 0 and
                          open(rt, "rb").read() == open(dst, "rb").read())
            opts["wav_roundtrip"] = "ok" if ok_wav else "MISMATCH"
            if not ok_wav:
                return {"idx": idx, "ok": False, "rc": rc, "got": got,
                        "want": -4, "opts": opts}

        # resume-equivalence: interrupt at ~half the input, checkpoint,
        # resume against the full input — byte-identical to the
        # uninterrupted run.  Exercises carry-checkpoint completeness for
        # whatever stateful stages this combination selected (filter
        # tails, NCO phase, AGC state, IQ factors, DC state).
        if rc == 0 and mode < 0.4:
            half = os.path.join(tmp, "half.raw")
            cut = (n // 2) * fmt.bytes_per_frame
            with open(src, "rb") as fh:
                head = fh.read(cut)
            with open(half, "wb") as fh:
                fh.write(head)
            dst2 = os.path.join(tmp, "out_resumed.raw")
            ck = os.path.join(tmp, "state.ckpt")
            swap = lambda a: [dst2 if x == dst else half if x == src else x
                              for x in a]
            rc1 = cli.main(swap(args) + ["--checkpoint", ck])
            args2 = [dst2 if x == dst else x for x in args]
            rc2 = cli.main(args2 + ["--checkpoint", ck, "--resume"])
            same = (rc1 == 0 and rc2 == 0
                    and open(dst, "rb").read() == open(dst2, "rb").read())
            opts["resume"] = "ok" if same else f"MISMATCH rc={rc1},{rc2}"
            if not same:
                return {"idx": idx, "ok": False, "rc": rc,
                        "got": got, "want": -2, "opts": opts}
        from fractions import Fraction
        fr = Fraction(rate_out, rate_in).limit_denominator(1_000_000)
        want = n * fr.numerator // fr.denominator \
            if rate_in != rate_out else n
        ok = rc == 0 and got == want
        return {"idx": idx, "ok": ok, "rc": rc, "got": got, "want": want,
                "opts": opts}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    rng = np.random.default_rng(a.seed)
    bad = 0
    for i in range(a.n):
        try:
            r = one_case(rng, i)
        except Exception as e:  # a crash IS the finding
            r = {"idx": i, "ok": False, "error": repr(e)[:300]}
        if not r["ok"]:
            bad += 1
            print(json.dumps(r), flush=True)
        elif i % 10 == 0:
            print(json.dumps({"idx": i, "ok": True}), flush=True)
    print(json.dumps({"total": a.n, "failed": bad}), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
