#!/bin/bash
# Round-4 queue phase J — waits for phase I (genbisect), then:
#   1. s2_gen_remat_512 — the 512px generator compile WITH per-block VAE
#      remat (VAEConfig.use_checkpoint; CPU-verified param-tree-identical).
#   2. train2_512_remat — if that compiles, the full split-step stage-2
#      bench at the reference's 512px config.
set -u
cd /root/repo
OUT=/tmp/bench_r04

for i in $(seq 1 480); do
  grep -q "QUEUE-R04I COMPLETE" "$OUT/queue.log" 2>/dev/null && break
  sleep 30
done
grep -q "QUEUE-R04I COMPLETE" "$OUT/queue.log" || {
  echo "phase I never completed; aborting J" | tee -a "$OUT/queue.log"; exit 1; }

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

run s2_gen_remat_512 timeout 7200 python -u tools/probe_s2_compile.py --size 512 --piece gen --remat

if grep -q "PROBE gen: OK" "$OUT/s2_gen_remat_512.log" 2>/dev/null; then
  run train2_512_remat timeout 7200 python -u bench.py --mode train2 --size 512 --iters 3 --split-step --remat2
else
  echo "remat gen compile failed too; skipping train2_512_remat" \
    | tee -a "$OUT/queue.log"
fi

echo "=== [$(date +%H:%M:%S)] QUEUE-R04J COMPLETE" | tee -a "$OUT/queue.log"
