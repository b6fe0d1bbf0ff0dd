#!/bin/bash
# Round-4 queue phase H — waits for phase G to complete, then:
#   1. tile_whole_ov16_b — re-measure the whole-frame tile geometry after
#      the warp VMEM-accounting fix (the 92x160 patch latent now takes the
#      XLA guided warp; the Pallas kernel's real working set is 2 matrices,
#      not 1 — see ops/pallas/flow_warp.py).
#   2. train2_512_retry — only if s2_probe_512 reported every piece OK.
set -u
cd /root/repo
OUT=/tmp/bench_r04

# wait for phase G (up to 4h)
for i in $(seq 1 480); do
  grep -q "QUEUE-R04G COMPLETE" "$OUT/queue.log" 2>/dev/null && break
  sleep 30
done
grep -q "QUEUE-R04G COMPLETE" "$OUT/queue.log" || {
  echo "phase G never completed; aborting H" | tee -a "$OUT/queue.log"; exit 1; }

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

run tile_whole_ov16_b timeout 7200 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 1280 --pch-stride 1280 --tile-overlap 16 --iters 2

if grep -q "PROBE flows: OK" "$OUT/s2_probe_512.log" 2>/dev/null \
   && grep -q "PROBE gen: OK" "$OUT/s2_probe_512.log" 2>/dev/null \
   && grep -q "PROBE disc: OK" "$OUT/s2_probe_512.log" 2>/dev/null; then
  run train2_512_retry timeout 7200 python -u bench.py --mode train2 --size 512 --iters 3 --split-step
else
  echo "s2_probe_512 did not pass all pieces; skipping train2_512_retry" \
    | tee -a "$OUT/queue.log"
fi

echo "=== [$(date +%H:%M:%S)] QUEUE-R04H COMPLETE" | tee -a "$OUT/queue.log"
