#!/bin/bash
# Round-3 TPU queue, phase 5 (consolidated re-run): the VM hosting phases
# 2-4 restarted before their results landed, so this queue re-captures
# everything still missing, highest-value first:
#   1. headline segment bench (windows=4 default) post RDB-decomposition +
#      temporal-conv reformulation — also warms the persistent compile
#      cache for the driver's end-of-round bench.py run
#   2. decode profile (did the RDB fix deliver ~265 ms?)
#   3. solo-window segment (apples-to-apples decode-fix effect)
#   4. stage-1 train fit probes at 128/256/512 (remat / remat_lean / noremat)
#   5. stage-2 train probes at 256/384 (512 killed the remote-compile helper)
#   6. window-batch 6/8 probes
#   7. tile bench (reference VideoLQ protocol 320x180->1280x720), long
#   8. encode-layout anomaly check (--consume)
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

run seg_headline timeout 5400 python -u bench.py --iters 3
run prof_decode  timeout 3600 python -u tools/profile_decode.py --stage decode --logdir /tmp/mgld_prof_decode_rdb
run seg_w1       timeout 5400 python -u bench.py --windows 1 --iters 3
run train128     timeout 3600 python -u bench.py --mode train --size 128 --iters 3
run train256     timeout 3600 python -u bench.py --mode train --size 256 --iters 3
run train512     timeout 3600 python -u bench.py --mode train --size 512 --iters 3
run train2_256   timeout 3600 python -u bench.py --mode train2 --size 256 --iters 3
run train2_384   timeout 3600 python -u bench.py --mode train2 --size 384 --iters 3
run windows6     timeout 5400 python -u bench.py --windows 6 --iters 3
run windows8     timeout 5400 python -u bench.py --windows 8 --iters 3
run tile512      timeout 9000 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 512 --pch-stride 448 --iters 1
run prof_enc_consume timeout 3600 python -u tools/profile_decode.py --stage encode --consume --logdir /tmp/mgld_prof_enc_consume
echo "=== [$(date +%H:%M:%S)] QUEUE-F COMPLETE" | tee -a "$OUT/queue.log"
