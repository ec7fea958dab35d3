#!/bin/bash
# Round-5 seq14 — A/B of the two levers built after seq12's ablations:
#
# (a) BARK_TPU_GROUP_DOTS: qkv/fc/out as 3 group MXU dots per layer
#     (transposed multi-slot ring views, probe P9) instead of 11 per-tile
#     dots — targets the ~0.13 ms/token serial non-attention chain at
#     bark-large (seq12: baseline 0.888, ABLATE=att,kvdma 0.832, HBM
#     floor ~0.70).
# (b) BARK_TPU_ATT_GATE (flash-style v2): the (S, H) softmax VPU work and
#     the score/context dots all run per live KV chunk — targets the
#     0.037 ms/token attention share at bark-small (seq12 ABLATE=att;
#     the old MXU-only gate reclaimed just 0.005).
# Then e2e combos for the round-5 headline numbers.
set -u
SNAP=/tmp/bench_repo14
LOG=/root/repo/perf/r5/seq14.log
mkdir -p /root/repo/perf/r5

if [ -f /tmp/seq13.pid ]; then
  while kill -0 "$(cat /tmp/seq13.pid)" 2>/dev/null; do sleep 20; done
fi

rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
cd "$SNAP"
exec >>"$LOG" 2>&1

run() {
  echo "=== $1 $(date -u) ==="
  shift
  timeout 3600 "$@"
  echo "rc=$?"
}

DB="python tools/tpu_decode_bench.py"

# --- decode-step A/B, large ---
run "large coarse GROUP_DOTS" env BARK_TPU_GROUP_DOTS=1 \
  $DB --model large --stage coarse
run "large coarse GROUP+QHEAD+flashGATE" env BARK_TPU_GROUP_DOTS=1 \
  BARK_TPU_ATT_QHEAD=1 BARK_TPU_ATT_GATE=1 $DB --model large --stage coarse

# --- decode-step A/B, small ---
run "small coarse flashGATE" env BARK_TPU_ATT_GATE=1 \
  $DB --model small --stage coarse
run "small coarse GROUP+QHEAD+flashGATE" env BARK_TPU_GROUP_DOTS=1 \
  BARK_TPU_ATT_QHEAD=1 BARK_TPU_ATT_GATE=1 $DB --model small --stage coarse

# --- hardware token-parity gate for the new paths ---
run "gate quick (flash gate + group dots)" env BARK_TPU_GROUP_DOTS=1 \
  BARK_TPU_ATT_GATE=1 python tools/tpu_check.py --quick

# --- e2e: whichever combos the step A/Bs justify (run both anyway) ---
run "small dense e2e QHEAD+flashGATE" env BARK_TPU_ATT_QHEAD=1 \
  BARK_TPU_ATT_GATE=1 python bench.py
run "small dense e2e GROUP+QHEAD+flashGATE" env BARK_TPU_GROUP_DOTS=1 \
  BARK_TPU_ATT_QHEAD=1 BARK_TPU_ATT_GATE=1 python bench.py
run "large dense e2e kv8 GROUP+QHEAD+flashGATE" env BARK_TPU_GROUP_DOTS=1 \
  BARK_TPU_ATT_QHEAD=1 BARK_TPU_ATT_GATE=1 \
  python bench.py --model large --kv int8 --stage-times

echo "=== seq14 done $(date -u) ==="
