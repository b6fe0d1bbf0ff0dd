#!/bin/bash
# Round-5 queue phase C — tuning + clean re-measures on an idle host:
#   1/2. headline fs=1.0 with flow_chunk 16/24 — chunk 8 serializes the
#        48-eval full-res RAFT batch into 6 groups; fewer, larger groups
#        may claw back some of the 7.4% flow cost if they fit
#   3.   tile512_clean — the phase-A 0.2833 was measured while the test
#        suite held the host's single core; re-measure idle
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

run headline_fs10_ck16 timeout 3600 python -u bench.py --iters 2 \
  --flow-chunk 16
run headline_fs10_ck24 timeout 3600 python -u bench.py --iters 2 \
  --flow-chunk 24
run tile512_clean timeout 3000 env MGLD_PROGRESS=1 python -u bench.py \
  --mode tile --iters 2

echo "=== [$(date +%H:%M:%S)] QUEUE-R05C COMPLETE" | tee -a "$OUT/queue.log"
