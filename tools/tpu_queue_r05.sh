#!/bin/bash
# Round-5 queue phase A — serialized, one TPU job at a time, each item
# timeout-bounded. Items (VERDICT r4 "next round" list):
#   1. headline            — tip-code regression check + persistent-cache
#                            warm for the driver's end-of-round bench
#   2. headline_fs10       — the protocol-faithful flow_scale=1.0 headline
#                            (reference old.py:344-348 computes RAFT at
#                            full working res; shipped default is 0.5)
#   3. tile512             — tile-path regression check after the r05
#                            auto-envelope + sharded-gather refactor
#   4. train2_512_fused    — re-fuse the 3-program split step now that
#                            per-block remat shrank the gen program
#   5. train2_512_mr256    — selective remat (blocks >=256px only)
#   6. decode_gn_fp32      — MGLD_GN_FP32 A/B on the decode stage (the
#                            staged-but-never-measured r3 knob) + trace
# Touch /tmp/stop_queue to abort between items.
set -u
cd /root/repo
OUT=${OUT:-/tmp/bench_r05}
mkdir -p "$OUT"

emit() {  # emit NAME RC LINE — validate LINE as JSON before embedding
  name="$1"; rc="$2"; line="$3"
  if [ -n "$line" ] && python -c 'import json,sys; json.loads(sys.argv[1])' \
      "$line" 2>/dev/null; then
    echo "{\"item\": \"$name\", \"rc\": $rc, \"result\": $line}" \
      >> "$OUT/summary.jsonl"
  else
    echo "{\"item\": \"$name\", \"rc\": $rc, \"result\": null}" \
      >> "$OUT/summary.jsonl"
  fi
}

run() {
  name="$1"; shift
  [ -e /tmp/stop_queue ] && { echo "stop_queue set; skipping $name" \
    | tee -a "$OUT/queue.log"; return 1; }
  echo "=== [$(date +%H:%M:%S)] start $name: $*" | tee -a "$OUT/queue.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] done $name rc=$rc" | tee -a "$OUT/queue.log"
  emit "$name" "$rc" "$(grep -E '^\{' "$OUT/$name.log" | tail -1)"
  sleep 10
}

run headline timeout 5400 python -u bench.py --iters 2
run headline_fs10 timeout 5400 python -u bench.py --iters 2 --flow-scale 1.0
run tile512 timeout 3000 env MGLD_PROGRESS=1 python -u bench.py \
  --mode tile --iters 2
run train2_512_fused timeout 3600 python -u bench.py --mode train2 \
  --size 512 --iters 3 --remat2
run train2_512_mr256 timeout 3600 python -u bench.py --mode train2 \
  --size 512 --iters 3 --split-step --remat2 --remat-min-res 256
run decode_gn_default timeout 1800 python -u tools/profile_decode.py \
  --stage decode --logdir "$OUT/trace_decode_default"
run decode_gn_fp32 timeout 1800 env MGLD_GN_FP32=1 python -u \
  tools/profile_decode.py --stage decode --logdir "$OUT/trace_decode_fp32" 

echo "=== [$(date +%H:%M:%S)] QUEUE-R05A COMPLETE" | tee -a "$OUT/queue.log"
