"""On-chip channel-scaling sweep (the measurable scaling axis here).

The north star asks >=80% samples/s scaling efficiency.  With one real
chip and a 1-core host, wall-clock multi-host scaling cannot be measured
honestly (tests/test_multihost.py proves multi-process correctness; the
Gloo-CPU proxy shares one core, so its timings measure nothing).  What
CAN be measured on real hardware is the data-parallel channel axis on
one chip: aggregate Msps at C channels vs C * Msps(1) — the per-chip
term of the pod-scaling model (channels shard SPMD across chips with
zero cross-talk, so per-chip batching efficiency is the dominant factor;
the only cross-chip costs are the time-axis halos, one (C, H) ppermute
per stateful stage per step).

    python tools/channel_scaling.py [--block N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_all import IN_RATE, OUT_RATE, measure  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=1 << 18)
    ap.add_argument("--fold", type=int, default=1,
                    help="time-fold F per channel (pipeline/folded.py); "
                         "the C=1 sublane fix is --fold 8")
    ap.add_argument("--channels", type=int, nargs="*",
                    default=[1, 4, 16, 64, 128])
    opts = ap.parse_args()

    from iq_tool_tpu.ops.fir_design import FilterRequest
    from iq_tool_tpu.pipeline.chain import ChainConfig

    for c in opts.channels:
        cfg = ChainConfig(
            input_format="cs16", output_format="cs16",
            input_rate=IN_RATE, target_rate=OUT_RATE,
            channels=c, dc_block=True, freq_shift_pre_hz=100e3,
            filters=(FilterRequest("lowpass", 400e3),),
            target_block=opts.block)
        # small-channel steps are sub-millisecond; stretch the in-jit scan
        # so the two-length difference dwarfs tunnel jitter
        ks = (10, 110) if c <= 16 else (3, 23)
        msps = measure(cfg, c, ks=ks, fold=opts.fold)
        print(json.dumps({"channels": c, "fold": opts.fold,
                          "Msps_in": round(msps, 1),
                          "per_channel": round(msps / c, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
