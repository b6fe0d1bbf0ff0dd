#!/bin/bash
# Round-3 serialized TPU measurement queue (VERDICT #1).
# ONE TPU job at a time — concurrent jobs corrupt timings (NOTES.md).
# Logs to /tmp/bench_r03/<name>.log; summary JSON lines appended to
# /tmp/bench_r03/summary.jsonl as each item lands.
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
  # last JSON line of the log is the bench result
  tail -5 "$OUT/$name.log" | grep -E '^\{' | tail -1 | \
    sed "s/^/{\"item\": \"$name\", \"rc\": $rc, \"result\": /; s/$/}/" \
    >> "$OUT/summary.jsonl" || \
    echo "{\"item\": \"$name\", \"rc\": $rc, \"result\": null}" \
    >> "$OUT/summary.jsonl"
}

# (a) clean baseline — likely warm in the persistent compile cache
run baseline       timeout 3600 python bench.py --iters 3
# (b) window batching: the cheapest candidate fps multiplier
run windows2       timeout 3600 python bench.py --windows 2 --iters 3
run windows4       timeout 3600 python bench.py --windows 4 --iters 3
# (c) int8 convs e2e
run int8           timeout 3600 env MGLD_INT8_CONV=1 python bench.py --iters 3
# (d) training throughput (remat + noremat inside one run)
run train          timeout 3600 python bench.py --mode train --iters 3
run train2         timeout 3600 python bench.py --mode train2 --iters 3
# (e) tiled-canvas protocol: 512px patches first (960 killed the compiler
# in round 2 — run the risky size LAST so a crash can't block the queue)
run tile512        timeout 5400 python bench.py --mode tile --pch-size 512 --pch-stride 448 --iters 2
run tile960        timeout 5400 python bench.py --mode tile --pch-size 960 --pch-stride 750 --iters 2

echo "=== [$(date +%H:%M:%S)] QUEUE COMPLETE" | tee -a "$OUT/queue.log"
# NOTE (round-3 lesson): any side script that initializes JAX without
# pinning JAX_PLATFORMS=cpu grabs the axon TPU and OOMs the running bench.
