#!/bin/bash
# Round-5 seq12 — decode-step serial-time decomposition + the two new
# attention levers, plus the warm-start cProfile and the fixed TTFA.
#
# Background (seq10/11): the ring-depth lever is dead, the isolated DMA
# chain streams ~950-1050 GB/s WITH per-tile dots, yet the real kernels
# run ~610 GB/s effective — the gap is serial compute between dots
# (attention math, LN, softmax), not DMA. The ablation flags
# (BARK_TPU_PROBE_ABLATE, wrong numerics, timing only) split a real
# decode step on hardware; BARK_TPU_ATT_QHEAD (transpose-free q-head
# scores) and BARK_TPU_ATT_GATE (skip MXU dots on dead KV chunks) are
# the candidate fixes. Warm-start: seq11 showed 97% of a warm start is
# host tracing/lowering (NOT cache reads/compiles/syncs) — the cProfile
# names the owner.
set -u
SNAP=/tmp/bench_repo12
LOG=/root/repo/perf/r5/seq12.log
mkdir -p /root/repo/perf/r5

# serialize on the chip: wait for seq11 to finish
if [ -f /tmp/seq11.pid ]; then
  while kill -0 "$(cat /tmp/seq11.pid)" 2>/dev/null; do sleep 20; done
fi

rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
cd "$SNAP"
exec >>"$LOG" 2>&1

run() {
  echo "=== $1 $(date -u) ==="
  shift
  timeout 3000 "$@"
  echo "rc=$?"
}

DB="python tools/tpu_decode_bench.py"

# --- large coarse: serial-time decomposition + levers ---
run "large coarse baseline" $DB --model large --stage coarse
run "large coarse ABLATE=att" env BARK_TPU_PROBE_ABLATE=att \
  $DB --model large --stage coarse
run "large coarse ABLATE=att,kvdma" env BARK_TPU_PROBE_ABLATE=att,kvdma \
  $DB --model large --stage coarse
run "large coarse QHEAD" env BARK_TPU_ATT_QHEAD=1 \
  $DB --model large --stage coarse
run "large coarse GATE" env BARK_TPU_ATT_GATE=1 \
  $DB --model large --stage coarse
run "large coarse QHEAD+GATE" env BARK_TPU_ATT_QHEAD=1 BARK_TPU_ATT_GATE=1 \
  $DB --model large --stage coarse

# --- small coarse: same levers (the headline reclaim target) ---
run "small coarse baseline" $DB --model small --stage coarse
run "small coarse ABLATE=att" env BARK_TPU_PROBE_ABLATE=att \
  $DB --model small --stage coarse
run "small coarse QHEAD" env BARK_TPU_ATT_QHEAD=1 \
  $DB --model small --stage coarse
run "small coarse GATE" env BARK_TPU_ATT_GATE=1 \
  $DB --model small --stage coarse
run "small coarse QHEAD+GATE" env BARK_TPU_ATT_QHEAD=1 BARK_TPU_ATT_GATE=1 \
  $DB --model small --stage coarse

# --- warm-start residual owner (seq11: 158.8 s of tracing/dispatch) ---
run "warmstart cprofile small dense" python tools/warmstart_profile.py \
  --cprofile

# --- TTFA, fixed (_LMSpan static lm-tile span) ---
run "TTFA small dense" python bench.py --ttfa

echo "=== seq12 done $(date -u) ==="
