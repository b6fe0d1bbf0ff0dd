#!/bin/bash
# Round-4 queue phase B — serialized, ONE job on the chip (memory:
# tpu-queue-discipline). Phase B holds the items whose outcome is a
# VERDICT (compiles? GO/NO-GO?) rather than a shipping timing, so builder
# dev work (nice -n 19) may overlap it:
#   1. stage-2 @512px retry: the r04a run crashed the remote compile helper
#      (HTTP 500) with the 3-forward adaptive-d_weight formulation; the
#      step is now ONE forward + three vjp pulls.
#   2. Pallas conv3x3 microbench: the r04a probe PASSED on hardware
#      (PROBE_OK maxerr=0.0257) for the first time after the pre-shifted
#      layout restructure. Verdict parsed with PYTHON (r03 awk 'nanx' trap).
# Timing-sensitive shipping numbers (tile re-measures, seg_pconv e2e,
# stage-1 ladder) live in tpu_queue_r04c.sh and run on a quiet host.
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

run train2_512b  timeout 7200 python -u bench.py --mode train2 --size 512 --iters 3

run pconv_micro3 timeout 2700 python -u tools/microbench.py --stage pconv
if python3 - "$OUT/pconv_micro3.log" <<'PYEOF'
import re, sys, math
ok = False
for line in open(sys.argv[1]):
    m = re.search(r"speedup\s+([0-9.]+)x\s+maxerr\s+([0-9.a-z]+)", line)
    if not m:
        continue
    try:
        sp, err = float(m.group(1)), float(m.group(2))
    except ValueError:
        continue
    if math.isfinite(sp) and math.isfinite(err) and sp >= 1.15 and err < 0.25:
        ok = True
sys.exit(0 if ok else 1)
PYEOF
then
  touch "$OUT/pconv_go"
  echo "=== pconv microbench verdict: GO (python-parsed >=1.15x, finite err)" \
    | tee -a "$OUT/queue.log"
else
  echo "=== pconv microbench verdict: NO-GO" | tee -a "$OUT/queue.log"
fi

echo "=== [$(date +%H:%M:%S)] QUEUE-R04B COMPLETE" | tee -a "$OUT/queue.log"
