#!/bin/bash
# Round-4 queue phase G — the VM restarted again after phase E's tile runs;
# compile cache wiped, phase E items 4-6 and all of phase F never ran.
# Serialized re-run of everything still outstanding:
#   1. headline        — 6-window segment bench (also re-warms the persistent
#                        compile cache for the driver's end-of-round bench)
#   2. tile_whole_ov16 — tuned tile geometry: ONE whole-frame patch
#                        (pch 1280) + latent tile_overlap 16 = the minimum
#                        6-tile cover at 1.00x pixel work, one coherent
#                        trajectory per frame (both knobs are reference flags)
#   3. s2_probe_512    — compile-only bisect of the stage-2 512px failure
#   4. train2_384_split — split-step control at the largest fused-OK size
#   5. decode_trace    — fresh xplane decode trace (re-attribute the 272 ms)
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

run headline timeout 3600 python -u bench.py --iters 3
run tile_whole_ov16 timeout 7200 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 1280 --pch-stride 1280 --tile-overlap 16 --iters 2
run s2_probe_512 timeout 7200 python -u tools/probe_s2_compile.py --size 512
run train2_384_split timeout 5400 python -u bench.py --mode train2 --size 384 --iters 3 --split-step
run decode_trace timeout 3600 python -u tools/profile_decode.py --stage decode --logdir /tmp/mgld_prof_r04g

echo "=== [$(date +%H:%M:%S)] QUEUE-R04G COMPLETE" | tee -a "$OUT/queue.log"
