#!/bin/bash
# Round-3 TPU queue, phase 7 — supersedes the r03f remainder and r03g.
# The round ends ~08:00 and the driver needs the chip for the end-of-round
# bench.py run, so the remaining items run in priority order with per-item
# time gates (an item is skipped if its estimated duration would cross the
# 07:20 cutoff):
#   1. pconv microbench — Pallas shifted-matmul conv3x3 verdict at the
#      decode's hot shapes (the 47-55%-MXU offenders in the r03 trace)
#   2. stage-1 train fit probes (512 first) with the memory fixes that
#      landed after r03f's pre-fix probes OOM'd: train-state donation +
#      bf16 frozen-tower storage
#   3. (auto-gated on the microbench verdict) headline segment bench with
#      MGLD_PALLAS_CONV=auto — if the kernel wins, this is a direct
#      headline-fps lever
#   4. tile bench (reference VideoLQ protocol 320x180 -> 1280x720, VERDICT
#      r2 missing-item 1c)
#   5. remaining train probes
set -u
cd /root/repo
OUT=/tmp/bench_r03
mkdir -p "$OUT"
CUT=$(date -d '07:20' +%s)
R03F_PID=1000        # bash tools/tpu_queue_r03f.sh (this session's host)
R03G_WAITER_PID=18629  # bash -c 'while kill -0 1000 ...; tpu_queue_r03g.sh'

# Stop the old queues without orphan collisions: kill the r03g waiter so
# r03g never launches; kill the r03f driver so it starts nothing new (its
# in-flight item survives as an orphan); then wait until the chip is quiet.
kill "$R03G_WAITER_PID" 2>/dev/null || true
kill "$R03F_PID" 2>/dev/null || true
busy() { ps -eo args | grep -E 'python -u (bench\.py|tools/)' | grep -cv grep; }
while [ "$(busy)" -gt 0 ]; do sleep 5; done
sleep 25   # let the axon server release HBM

# r03f died before it could book-keep its in-flight item; recover it.
for it in windows6 windows8; do
  if ! grep -q "\"item\": \"$it\"" "$OUT/summary.jsonl" 2>/dev/null; then
    line=$(grep -E '^\{' "$OUT/$it.log" 2>/dev/null | tail -1)
    [ -n "$line" ] && echo "{\"item\": \"$it\", \"rc\": 0, \"result\": $line}" \
      >> "$OUT/summary.jsonl"
  fi
done

run() {
  est_min="$1"; name="$2"; shift 2
  if [ "$(date +%s)" -gt $((CUT - est_min * 60)) ]; then
    echo "=== [$(date +%H:%M:%S)] SKIP $name (est ${est_min}m past cutoff)" \
      | tee -a "$OUT/queue.log"
    return
  fi
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

run 25 pconv_micro  timeout 2700 python -u tools/microbench.py --stage pconv
# auto-verdict: any hot shape >=1.15x faster than XLA => measure e2e
if awk '/^conv3x3/ {s=0; for(i=1;i<=NF;i++) if($i=="speedup") s=$(i+1)+0;
        if (s>=1.15) ok=1} END {exit !ok}' "$OUT/pconv_micro.log" 2>/dev/null; then
  touch "$OUT/pconv_go"
  echo "=== pconv microbench verdict: GO (>=1.15x on a hot shape)" \
    | tee -a "$OUT/queue.log"
fi
run 25 train512_fix timeout 2700 python -u bench.py --mode train --size 512 --iters 3
if [ -f "$OUT/pconv_go" ]; then
  run 35 seg_pconv  timeout 4200 env MGLD_PALLAS_CONV=auto python -u bench.py --iters 3
fi
run 75 tile512      timeout 4500 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 512 --pch-stride 448 --iters 1
run 12 train128_fix timeout 1800 python -u bench.py --mode train --size 128 --iters 3
run 12 train256_fix timeout 1800 python -u bench.py --mode train --size 256 --iters 3
run 25 train2_512   timeout 2700 python -u bench.py --mode train2 --size 512 --iters 3
if [ -f "$OUT/pconv_go" ]; then
  run 15 prof_dec_pconv timeout 1800 env MGLD_PALLAS_CONV=auto \
    python -u tools/profile_decode.py --stage decode --logdir /tmp/mgld_prof_decode_pconv
fi
echo "=== [$(date +%H:%M:%S)] QUEUE-H COMPLETE" | tee -a "$OUT/queue.log"
