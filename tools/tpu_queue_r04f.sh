#!/bin/bash
# Round-4 queue phase F — run AFTER tpu_queue_r04e.sh completes.
# 1. tile_whole_ov16 — the tuned tile geometry: ONE whole-frame patch
#    (pch 1280 >= work width) with latent tile_overlap 16, giving the
#    minimum 6-tile cover of the 160x92 working latent (same UNet work as
#    the 512/448 grid) at 1.00x pixel decode/encode work (vs 1.67x) and a
#    single coherent sampling trajectory for the whole frame. Both knobs
#    are reference script flags (vqgantile_size / --tile_overlap).
# 2. headline re-check with iters 5 for a tighter best-of.
set -u
cd /root/repo
OUT=/tmp/bench_r04
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

run tile_whole_ov16 timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 1280 --pch-stride 1280 --tile-overlap 16 --iters 2

echo "=== [$(date +%H:%M:%S)] QUEUE-R04F COMPLETE" | tee -a "$OUT/queue.log"
