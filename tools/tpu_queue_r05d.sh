#!/bin/bash
# Round-5 queue phase D — depth items on an idle host:
#   1/2. tp_png vs tp_packed — stage-1 512px input-pipeline A/B: the
#        2000-step soak measured the python PNG+degradation feed capping
#        steps/s at 0.93 median (1.48 pure-compute) on this 1-core host;
#        A/B the native packed-record loader against it end-to-end
#   3.   soak1_long — 5000-step stage-1 soak (hours-scale steps/s
#        stability + the SIGUSR1/kill/resume cycle at step 2500)
#   4.   quality_full — the quality harness over the PRODUCTION-width
#        model (--preset full, 256px, 50 steps, random weights)
# Touch /tmp/stop_queue to abort between items.
set -u
cd /root/repo
OUT=${OUT:-/tmp/bench_r05}
mkdir -p "$OUT"

emit() {
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

run tp_png timeout 3600 python -u tools/soak_train.py --stage 1 \
  --steps 300 --throughput-only --workdir /tmp/tp_png --log-every 25
run tp_packed timeout 3600 python -u tools/soak_train.py --stage 1 \
  --steps 300 --throughput-only --packed --workdir /tmp/tp_packed \
  --log-every 25
run soak1_long timeout 14000 python -u tools/soak_train.py --stage 1 \
  --steps 5000 --sig-frac 0.5 --workdir /tmp/soak1L --log-every 25
run quality_full timeout 5400 python -u tools/quality_smoke.py \
  --workdir /tmp/qfull --preset full --gt-size 256

echo "=== [$(date +%H:%M:%S)] QUEUE-R05D COMPLETE" | tee -a "$OUT/queue.log"
