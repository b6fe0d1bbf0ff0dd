#!/bin/bash
# Round-4 queue phase D — run AFTER tpu_queue_r04c.sh completes.
# Bisects the stage-2 @512px compile failure (train2_512b fused and
# train2_512c split BOTH died with remote_compile HTTP 500): AOT-compile
# each split program separately, plus a single-pull generator variant, to
# find the blowup. Compile-only probes; then a 384px split-step control
# (the largest size that compiled fused in r03).
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

run s2_probe_512 timeout 7200 python -u tools/probe_s2_compile.py --size 512
run train2_384_split timeout 5400 python -u bench.py --mode train2 --size 384 --iters 3 --split-step
# tile re-measures on the fixed code: device-side gather (2b40eaa) and the
# 960px patch geometry unblocked by the warp VMEM gate
run tile512_c timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 512 --pch-stride 448 --iters 2
run tile960_ref_b timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 960 --pch-stride 750 --iters 2

echo "=== [$(date +%H:%M:%S)] QUEUE-R04D COMPLETE" | tee -a "$OUT/queue.log"
