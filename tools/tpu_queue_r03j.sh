#!/bin/bash
# Round-3 TPU queue, phase 9 — final items after tile512. Two lessons
# baked in from phases g-i: (1) identify queue pids via ps, never via a
# pid file ($! under the session harness can be a sandbox wrapper); (2)
# this host's awk parses 'nanx' as nan AND evaluates nan>=1.15 as TRUE,
# so the Pallas-conv verdict is now a python regex over real numbers,
# gated behind a 2-minute Mosaic compile probe (the first kernel shape
# crashed the remote-compile helper; the rank-3 DMA restructure needs a
# cheap validation before burning a 20-min microbench slot).
set -u
cd /root/repo
OUT=/tmp/bench_r03
mkdir -p "$OUT"
CUT=$(date -d '07:20' +%s)

# the caller kills r03i by its ps-discovered pid before launching this;
# wait out whatever item is still in flight, then recover its bookkeeping
busy() { ps -eo args | grep -E 'python -u (bench\.py|tools/)' | grep -cv grep; }
while [ "$(busy)" -gt 0 ]; do sleep 5; done
sleep 25
for it in tile512; do
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
  sleep 20
}

run 4 pconv_probe timeout 600 python -u tools/pconv_probe.py
if grep -q PROBE_OK "$OUT/pconv_probe.log" 2>/dev/null; then
  run 22 pconv_micro3 timeout 2400 python -u tools/microbench.py --stage pconv
  if python - "$OUT/pconv_micro3.log" <<'PY'
import re, sys
sp = [float(m) for m in
      re.findall(r"speedup +([0-9.]+)x", open(sys.argv[1]).read())]
sys.exit(0 if any(s >= 1.15 for s in sp) else 1)
PY
  then
    touch "$OUT/pconv_go"
    echo "=== pconv verdict: GO" | tee -a "$OUT/queue.log"
  fi
fi
run 12 train128_fix timeout 1500 python -u bench.py --mode train --size 128 --iters 3
if [ -f "$OUT/pconv_go" ]; then
  run 35 seg_pconv  timeout 4200 env MGLD_PALLAS_CONV=auto python -u bench.py --iters 3
fi
run 12 train256_fix timeout 1500 python -u bench.py --mode train --size 256 --iters 3
run 22 train2_512   timeout 2400 python -u bench.py --mode train2 --size 512 --iters 3
echo "=== [$(date +%H:%M:%S)] QUEUE-J COMPLETE" | tee -a "$OUT/queue.log"
