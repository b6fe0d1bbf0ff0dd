#!/bin/bash
# Round-3 TPU queue, phase 6: items unlocked by the two fixes landed after
# r03f started —
#   (a) train-step memory levers (state donation + bf16 frozen storage):
#       re-run the stage-1 train fits that OOM'd pre-fix, and retry
#       stage-2 at 512 (also captures its phase-1 AssertionError traceback
#       if it persists)
#   (b) Pallas shifted-matmul conv3x3: microbench vs XLA at the decode's
#       hot shapes, then (regardless of verdict — the numbers are the
#       point) decode profile + headline bench with MGLD_PALLAS_CONV=auto
set -u
cd /root/repo
OUT=/tmp/bench_r03
mkdir -p "$OUT"

run() {
  name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] start $name: $*" | tee -a "$OUT/queue.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] done $name rc=$rc" | tee -a "$OUT/queue.log"
  line=$(grep -E '^\{' "$OUT/$name.log" | tail -1)
  if [ -n "$line" ]; then
    echo "{\"item\": \"$name\", \"rc\": $rc, \"result\": $line}" \
      >> "$OUT/summary.jsonl"
  else
    echo "{\"item\": \"$name\", \"rc\": $rc, \"result\": null}" \
      >> "$OUT/summary.jsonl"
  fi
  sleep 20
}

run pconv_micro  timeout 3600 python -u tools/microbench.py --stage pconv
run train128_fix timeout 3600 python -u bench.py --mode train --size 128 --iters 3
run train256_fix timeout 3600 python -u bench.py --mode train --size 256 --iters 3
run train512_fix timeout 4800 python -u bench.py --mode train --size 512 --iters 3
run train2_512   timeout 4800 python -u bench.py --mode train2 --size 512 --iters 3
run prof_dec_pconv timeout 3600 env MGLD_PALLAS_CONV=auto python -u tools/profile_decode.py --stage decode --logdir /tmp/mgld_prof_decode_pconv
run seg_pconv    timeout 5400 env MGLD_PALLAS_CONV=auto python -u bench.py --iters 3
echo "=== [$(date +%H:%M:%S)] QUEUE-G COMPLETE" | tee -a "$OUT/queue.log"
