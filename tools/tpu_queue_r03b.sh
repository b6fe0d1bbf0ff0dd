#!/bin/bash
# Round-3 TPU queue, phase 2: train retry (phase-1 OOM was a collision with
# a stray CPU-unpinned debug script), deeper window-batch probes, and the
# decode/denoise profiling traces.
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
  tail -5 "$OUT/$name.log" | grep -E '^\{' | tail -1 | \
    sed "s/^/{\"item\": \"$name\", \"rc\": $rc, \"result\": /; s/$/}/" \
    >> "$OUT/summary.jsonl" || \
    echo "{\"item\": \"$name\", \"rc\": $rc, \"result\": null}" \
    >> "$OUT/summary.jsonl"
}

run train          timeout 3600 python bench.py --mode train --iters 3
# train2 retry: phase-1 failure was the missing channel_sums VJP (fixed)
run train2         timeout 3600 python bench.py --mode train2 --iters 3
run windows6       timeout 3600 python bench.py --windows 6 --iters 3
run windows8       timeout 3600 python bench.py --windows 8 --iters 3
run prof_decode    timeout 3600 python tools/profile_decode.py --stage decode --logdir /tmp/mgld_prof_decode
run prof_denoise   timeout 3600 python tools/profile_decode.py --stage denoise --logdir /tmp/mgld_prof_denoise
run prof_encode    timeout 3600 python tools/profile_decode.py --stage encode --logdir /tmp/mgld_prof_encode

echo "=== [$(date +%H:%M:%S)] QUEUE-B COMPLETE" | tee -a "$OUT/queue.log"
