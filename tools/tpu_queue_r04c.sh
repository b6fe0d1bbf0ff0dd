#!/bin/bash
# Round-4 queue phase C — the SHIPPING timing numbers. Run AFTER
# tpu_queue_r04b.sh completes, on a QUIET host (no pytest/dev work; this
# box has one CPU core and host contention perturbs e2e timings —
# memory: tpu-queue-discipline).
#   1. tile re-measures with the flows-jit retrace fix (r04a burned
#      ~20s/clip retracing RAFT per call) at the r03-comparable 512/448
#      geometry and the reference 960/750 geometry.
#   2. seg_pconv: e2e segment bench with the Pallas conv on — only if
#      phase B wrote pconv_go.
#   3. deferred r03 probes (VERDICT #6): stage-1 128/256 ladder, encode
#      --consume layout probe.
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

run train2_512c  timeout 7200 python -u bench.py --mode train2 --size 512 --iters 3 --split-step
run tile512_b    timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 512 --pch-stride 448 --iters 2
run tile960_ref  timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 960 --pch-stride 750 --iters 2
# (phase-B pconv verdict was NO-GO: 0.65-0.82x vs XLA + batch-shape OOM;
# the kernel/flag were deleted, so the formerly gated seg_pconv /
# tile512_pconv items are gone with it)
run train128_fix2 timeout 3600 python -u bench.py --mode train --size 128 --iters 3 --variants remat
run train256_fix  timeout 3600 python -u bench.py --mode train --size 256 --iters 3 --variants remat
run enc_consume   timeout 1800 python -u tools/profile_decode.py --stage encode --consume

echo "=== [$(date +%H:%M:%S)] QUEUE-R04C COMPLETE" | tee -a "$OUT/queue.log"
