#!/bin/bash
# Round-3 hardware evidence sequence — run on the TPU host the moment the
# axon tunnel recovers.  Each stage appends to /tmp/round3_hw.log and
# writes its artifact; safe to re-run (stages are independent processes,
# so one poisoned device client cannot sink the rest).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/round3_hw.log
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "1/6 tpu_smoke (kernel lowering + CLI on silicon)"
timeout 3600 python tools/tpu_smoke.py 2>&1 | tee -a "$LOG"

say "2/6 sharded fix ladder (axon UNIMPLEMENTED bisect)"
timeout 7200 python tools/sharded_hw_fix.py 2>&1 | tee -a "$LOG"

say "3/6 bench.py (driver headline metric)"
timeout 3600 python bench.py 2>&1 | tee -a "$LOG"

say "4/6 bench_all (5-config matrix with the round-3 kernels)"
timeout 7200 python tools/bench_all.py 2>&1 | tee -a "$LOG"

say "5/6 channel scaling incl. the C=1 sublane fold"
timeout 7200 python tools/channel_scaling.py --channels 1 4 16 64 128 \
    2>&1 | tee -a "$LOG"
timeout 3600 python tools/channel_scaling.py --channels 1 --fold 8 \
    2>&1 | tee -a "$LOG"

say "6/6 endurance spot-check"
timeout 3600 python tools/endurance.py --seconds 20 2>&1 | tee -a "$LOG" \
    || true

say "done — paste the numbers into docs/PERF.md"
