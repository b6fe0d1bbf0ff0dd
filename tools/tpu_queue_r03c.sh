#!/bin/bash
# Round-3 TPU queue, phase 2 (relaunch after the session driver killed the
# phase-1 tail): profiling traces first (they unblock the decode attack on
# the CPU side), then the train retries (channel_sums VJP fix landed after
# the phase-1 failures), window-batch probes, and the tile bench last with
# a long timeout + MGLD_PROGRESS so compile-vs-run time is visible.
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
  sleep 20   # let the axon server release HBM between items
}

run prof_decode  timeout 3600 python -u tools/profile_decode.py --stage decode --logdir /tmp/mgld_prof_decode
run prof_denoise timeout 3600 python -u tools/profile_decode.py --stage denoise --logdir /tmp/mgld_prof_denoise
run prof_encode  timeout 3600 python -u tools/profile_decode.py --stage encode --logdir /tmp/mgld_prof_encode
run train        timeout 3600 python -u bench.py --mode train --iters 3
run train256     timeout 3600 python -u bench.py --mode train --size 256 --iters 3
run train2       timeout 3600 python -u bench.py --mode train2 --iters 3
run windows6     timeout 3600 python -u bench.py --windows 6 --iters 3
run windows8     timeout 3600 python -u bench.py --windows 8 --iters 3
run tile512      timeout 10000 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 512 --pch-stride 448 --iters 1
echo "=== [$(date +%H:%M:%S)] QUEUE-C COMPLETE" | tee -a "$OUT/queue.log"
