#!/bin/bash
# Round-4 TPU queue (serialized; ONE job on the chip at a time — see
# memory: tpu-queue-discipline. Kill via `ps -eo pid,ppid,args | grep
# tpu_queue`, never pkill patterns).
# Order: (1) settle the Pallas-conv Mosaic question cheaply, (2) the
# round's must-have numbers — tile512 on the FIXED jitted path, stage-2
# @512, windows=8 with chunked decode, (3) the deferred stage-1 ladder +
# encode --consume probe, (4) conditional pconv follow-ups (python-regex
# verdict, NEVER awk: this host's awk parses 'nanx' as nan >= 1.15), and
# (5) LAST a headline run to re-warm the compile cache for the driver's
# end-of-round bench.py.
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
  sleep 20   # let the axon server release HBM between items
}

run pconv_probe  timeout 900  python -u tools/pconv_probe.py
run tile512      timeout 10800 env MGLD_PROGRESS=1 python -u bench.py --mode tile --pch-size 512 --pch-stride 448 --iters 1
run train2_512   timeout 7200 python -u bench.py --mode train2 --size 512 --iters 3
run windows8_chunk2 timeout 7200 python -u bench.py --windows 8 --decode-chunk 2 --iters 3
if grep -q '"value": [0-9.]*[1-9]' "$OUT/windows8_chunk2.log" 2>/dev/null; then
  run windows10_chunk2 timeout 7200 python -u bench.py --windows 10 --decode-chunk 2 --iters 3
fi
run train128_fix timeout 3600 python -u bench.py --mode train --size 128 --iters 3
run train256_fix timeout 3600 python -u bench.py --mode train --size 256 --iters 3
if grep -q PROBE_OK "$OUT/pconv_probe.log" 2>/dev/null; then
  run pconv_micro timeout 2700 python -u tools/microbench.py --stage pconv
  if python - "$OUT/pconv_micro.log" <<'PY'
import re, sys
ok = False
for line in open(sys.argv[1]):
    m = re.search(r"speedup\s+([0-9]+(?:\.[0-9]+)?)x", line)
    if m and float(m.group(1)) >= 1.15:
        ok = True
sys.exit(0 if ok else 1)
PY
  then
    echo "=== pconv verdict: GO (python-regex, numeric >=1.15x)" \
      | tee -a "$OUT/queue.log"
    run seg_pconv timeout 5400 env MGLD_PALLAS_CONV=auto python -u bench.py --iters 3
    run prof_dec_pconv timeout 3600 env MGLD_PALLAS_CONV=auto python -u tools/profile_decode.py --stage decode --logdir /tmp/mgld_prof_decode_pconv_r04
  else
    echo "=== pconv verdict: NO-GO (no numeric speedup >=1.15x)" \
      | tee -a "$OUT/queue.log"
  fi
fi
run prof_enc_consume timeout 3600 python -u tools/profile_decode.py --stage encode --consume --logdir /tmp/mgld_prof_enc_consume_r04
run seg_headline timeout 7200 python -u bench.py --iters 3
echo "=== [$(date +%H:%M:%S)] QUEUE-R04 COMPLETE" | tee -a "$OUT/queue.log"
