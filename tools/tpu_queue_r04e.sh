#!/bin/bash
# Round-4 queue phase E — the VM hosting phases A-C restarted (compile
# cache wiped, phase D never ran). Serialized re-run of the phase-D items
# plus a headline regression check first (it also re-warms the persistent
# compile cache for the driver's end-of-round bench run):
#   1. headline      — default 6-window segment bench on the tip code
#   2. tile512_c     — tiled path on the device-side-gather code (2b40eaa)
#   3. tile960_ref_b — the reference's exact 960/750 patch geometry,
#                      unblocked by the warp VMEM gate
#   4. s2_probe_512  — compile-only bisect of the stage-2 512px failure
#   5. train2_384_split — split-step control at the largest size that
#                      compiled fused in r03
#   6. decode_trace  — fresh xplane decode trace (re-attribute the 272 ms)
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

run headline timeout 3600 python -u bench.py --iters 3
run tile512_c timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 512 --pch-stride 448 --iters 2
run tile960_ref_b timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 960 --pch-stride 750 --iters 2
run s2_probe_512 timeout 7200 python -u tools/probe_s2_compile.py --size 512
run train2_384_split timeout 5400 python -u bench.py --mode train2 --size 384 --iters 3 --split-step
run decode_trace timeout 3600 python -u tools/profile_decode.py --stage decode --logdir /tmp/mgld_prof_r04e

echo "=== [$(date +%H:%M:%S)] QUEUE-R04E COMPLETE" | tee -a "$OUT/queue.log"
