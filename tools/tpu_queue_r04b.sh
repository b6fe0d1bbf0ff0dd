#!/bin/bash
# Round-4 queue phase B (run AFTER tpu_queue_r04.sh completes; serialized).
# Re-measures the tile path with the flows-jit retrace fix (the r04a tile512
# run burned ~20s/clip retracing RAFT through a fresh jax.jit wrapper per
# call) at both the r03-comparable 512/448 geometry and the REFERENCE
# 960/750 geometry (2 patches of 736x960 vs 6 of 512x512 => 1.15x vs 1.67x
# pixel redundancy).
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

run tile512_b    timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 512 --pch-stride 448 --iters 2
run tile960_ref  timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 960 --pch-stride 750 --iters 2
echo "=== [$(date +%H:%M:%S)] QUEUE-R04B COMPLETE" | tee -a "$OUT/queue.log"
