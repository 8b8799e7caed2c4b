#!/bin/bash
# Round-4 hardware measurement sequence (VERDICT r3 items 1/3/8).
# tpu_smoke + sharded ladder already ran this round (/tmp/r4_smoke.log,
# /tmp/sharded_fix_r3.log); this script produces the MEASURED perf matrix
# that replaces every "est./pending" claim in docs/PERF.md.
# Appends to /tmp/round4_hw.log; each stage is its own process.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round4_hw.log
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "1/5 bench.py (flagship + config-4 canary, driver metric)"
timeout 2400 python bench.py 2>&1 | tee -a "$LOG"

say "2/5 bench_all (5-config matrix with the round-3 kernels)"
timeout 4800 python tools/bench_all.py 2>&1 | tee -a "$LOG"

say "3/5 channel scaling C=1..128"
timeout 4800 python tools/channel_scaling.py --channels 1 4 16 64 128 \
    2>&1 | tee -a "$LOG"

say "4/5 single-stream sublane fold C=1 F=2/4/8"
for f in 2 4 8; do
  timeout 2400 python tools/channel_scaling.py --channels 1 --fold "$f" \
      2>&1 | tee -a "$LOG"
done

say "5/5 endurance spot-check"
timeout 2400 python tools/endurance.py --seconds 20 2>&1 | tee -a "$LOG" \
    || true

say "done — fold the numbers into docs/PERF.md"
