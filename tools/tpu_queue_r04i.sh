#!/bin/bash
# Round-4 queue phase I — waits for phase H, then bisects WHICH loss term
# of the stage-2 generator step kills the compile helper at 512px
# (phase-G probe: flows OK 666s, disc OK 23.7s, gen FAIL even single-pull).
set -u
cd /root/repo
OUT=/tmp/bench_r04

for i in $(seq 1 480); do
  grep -q "QUEUE-R04H COMPLETE" "$OUT/queue.log" 2>/dev/null && break
  sleep 30
done
grep -q "QUEUE-R04H COMPLETE" "$OUT/queue.log" || {
  echo "phase H never completed; aborting I" | tee -a "$OUT/queue.log"; exit 1; }

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

run s2_genbisect_512 timeout 7200 python -u tools/probe_s2_compile.py --size 512 --piece genbisect

echo "=== [$(date +%H:%M:%S)] QUEUE-R04I COMPLETE" | tee -a "$OUT/queue.log"
