#!/bin/bash
# Round-3 TPU queue, phase 4 (after tpu_queue_r03d.sh): train-step fit
# probes with the new bench variants (remat / remat_lean=no-EMA+bf16mu /
# noremat) and static-HBM reporting, walking sizes up until OOM.
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

run train128 timeout 3600 python -u bench.py --mode train --size 128 --iters 3
run train256b timeout 3600 python -u bench.py --mode train --size 256 --iters 3
run train512b timeout 3600 python -u bench.py --mode train --size 512 --iters 3
# stage-2: the 512px program crashes the remote-compile helper (HTTP 500,
# r03 phase-2) — probe smaller spatial sizes to find the compile boundary
run train2_256 timeout 3600 python -u bench.py --mode train2 --size 256 --iters 3
run train2_384 timeout 3600 python -u bench.py --mode train2 --size 384 --iters 3
echo "=== [$(date +%H:%M:%S)] QUEUE-E COMPLETE" | tee -a "$OUT/queue.log"
