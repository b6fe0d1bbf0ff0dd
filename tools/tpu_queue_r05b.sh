#!/bin/bash
# Round-5 queue phase B — the long-running evidence items (VERDICT r4 #2
# and #8), serialized after phase A:
#   1. headline_fs10_w4 — fallback flow_scale=1.0 measurement at windows=4
#                         (only if phase A's 6-window fs10 OOMed: full-res
#                         RAFT corr volumes are ~67 MB/pair fp32)
#   2. soak1            — stage-1 @512px, 2000 steps on the chip through
#                         the real train CLI: loss curve, steps/s
#                         stability, HBM creep, SIGUSR1 ckpt + SIGKILL +
#                         auto-resume mid-run
#   3. soak2            — stage-2 video-VAE GAN @512px, 600 steps, same
#                         protocol
#   4. quality_smoke    — the quality harness end-to-end on-device with
#                         random weights (PSNR/SSIM/LPIPS/NIQE/E*warp/FID
#                         plumbing vs a bicubic baseline)
# Touch /tmp/stop_queue to abort between items.
set -u
cd /root/repo
OUT=${OUT:-/tmp/bench_r05}
mkdir -p "$OUT"

emit() {
  name="$1"; rc="$2"; line="$3"
  if [ -n "$line" ] && python -c 'import json,sys; json.loads(sys.argv[1])' \
      "$line" 2>/dev/null; then
    echo "{\"item\": \"$name\", \"rc\": $rc, \"result\": $line}" \
      >> "$OUT/summary.jsonl"
  else
    echo "{\"item\": \"$name\", \"rc\": $rc, \"result\": null}" \
      >> "$OUT/summary.jsonl"
  fi
}

run() {
  name="$1"; shift
  [ -e /tmp/stop_queue ] && { echo "stop_queue set; skipping $name" \
    | tee -a "$OUT/queue.log"; return 1; }
  echo "=== [$(date +%H:%M:%S)] start $name: $*" | tee -a "$OUT/queue.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] done $name rc=$rc" | tee -a "$OUT/queue.log"
  emit "$name" "$rc" "$(grep -E '^\{' "$OUT/$name.log" | tail -1)"
  sleep 10
}

# phase A measured: fs=1.0 at 6 windows compile-OOMs (27.66G vs 15.75G hbm
# -- the 96-pair full-res RAFT corr volumes). flow_chunk_pairs bounds the
# flow memory WITHOUT shrinking the sampler batch (equality-tested);
# window stepdown is the backup if even chunked flows don't fit.
run headline_fs10_ck8 timeout 5400 python -u bench.py --iters 2 \
  --flow-scale 1.0 --flow-chunk 8
if ! grep -qE '^\{' "$OUT/headline_fs10_ck8.log" 2>/dev/null; then
  run headline_fs10_w4 timeout 5400 python -u bench.py --iters 2 \
    --flow-scale 1.0 --windows 4 --flow-chunk 8
  if ! grep -qE '^\{' "$OUT/headline_fs10_w4.log" 2>/dev/null; then
    run headline_fs10_w2 timeout 5400 python -u bench.py --iters 2 \
      --flow-scale 1.0 --windows 2 --flow-chunk 8
  fi
fi

# stage-2 512px remat ladder: phase A measured fused+remat2 AND
# split+mr256 both crash the remote compile helper (HTTP 500, exit 1 —
# same signature as the r4 pre-remat fused crashes), while split+full-
# remat2 compiled and ran 0.4766 steps/s in r4. mr128 saves only the
# 64px-res blocks (minimal deviation from full remat); if it also
# crashes, full per-block remat is the only compiling 512px config and
# 0.4766 is the measured floor (helper-bound, not recompute-bound).
run train2_512_mr128 timeout 3600 python -u bench.py --mode train2 \
  --size 512 --iters 3 --split-step --remat2 --remat-min-res 128
run train2_512_full_remat timeout 3600 python -u bench.py --mode train2 \
  --size 512 --iters 3 --split-step --remat2

run soak1 timeout 7200 python -u tools/soak_train.py --stage 1 \
  --steps 2000 --workdir /tmp/soak1 --log-every 25
run soak2 timeout 7200 python -u tools/soak_train.py --stage 2 \
  --steps 600 --workdir /tmp/soak2 --log-every 10
run quality_smoke timeout 3600 python -u tools/quality_smoke.py \
  --workdir /tmp/qsmoke --preset tiny

echo "=== [$(date +%H:%M:%S)] QUEUE-R05B COMPLETE" | tee -a "$OUT/queue.log"
