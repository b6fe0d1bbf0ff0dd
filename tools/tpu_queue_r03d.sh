#!/bin/bash
# Round-3 TPU queue, phase 3 (run AFTER tpu_queue_r03c.sh completes):
# measure the RDB-decomposition + temporal-conv reformulation on the real
# chip (decode profile + headline segment bench), and re-check the
# anomalous standalone-encode result with consumed outputs.
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

run prof_decode_rdb timeout 3600 python -u tools/profile_decode.py --stage decode --logdir /tmp/mgld_prof_decode_rdb
run seg_rdb         timeout 5400 python -u bench.py --iters 3
run seg_rdb_w1      timeout 5400 python -u bench.py --windows 1 --iters 3
run prof_enc_consume timeout 3600 python -u tools/profile_decode.py --stage encode --consume --logdir /tmp/mgld_prof_enc_consume
echo "=== [$(date +%H:%M:%S)] QUEUE-D COMPLETE" | tee -a "$OUT/queue.log"
