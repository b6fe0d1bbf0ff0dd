#!/bin/bash
# Round-4 queue phase K — fresh VM (the machine hosting phases G/H restarted
# again; /tmp/bench_r04 and the persistent compile cache were wiped).
# Serialized, one TPU job at a time, bounded so the whole queue ends well
# inside the round:
#   1. headline          — re-warm the persistent compile cache for the
#                          driver's end-of-round bench + tip regression check
#   2. tile_whole_ov16   — the lost phase-H measurement: whole-frame patch
#                          (pch 1280, latent overlap 16) = minimum 6-tile
#                          cover at 1.00x pixel work, now that the warp VMEM
#                          gate (b836a80) routes the 92x160 latent to the
#                          XLA gather warp instead of compile-OOMing
#   3. s2_gen_remat_512  — phase-J plan: the 512px stage-2 generator compile
#                          with per-block VAE remat (4b926ba)
#   4. train2_512_remat  — full split-step stage-2 bench iff 3 compiled
# Touch /tmp/stop_queue to abort between items.
set -u
cd /root/repo
OUT=/tmp/bench_r04k
mkdir -p "$OUT"

run() {
  name="$1"; shift
  [ -e /tmp/stop_queue ] && { echo "stop_queue set; skipping $name" \
    | tee -a "$OUT/queue.log"; return 1; }
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
  sleep 10
}

run headline timeout 2400 python -u bench.py --iters 2
run tile_whole_ov16 timeout 3000 env MGLD_PROGRESS=1 python -u bench.py \
  --mode tile --pch-size 1280 --pch-stride 1280 --tile-overlap 16 --iters 2
run s2_gen_remat_512 timeout 2400 python -u tools/probe_s2_compile.py \
  --size 512 --piece gen --remat

if grep -q "PROBE gen: OK" "$OUT/s2_gen_remat_512.log" 2>/dev/null; then
  run train2_512_remat timeout 2400 python -u bench.py --mode train2 \
    --size 512 --iters 3 --split-step --remat2
else
  echo "gen remat compile failed; skipping train2_512_remat" \
    | tee -a "$OUT/queue.log"
fi

echo "=== [$(date +%H:%M:%S)] QUEUE-R04K COMPLETE" | tee -a "$OUT/queue.log"
