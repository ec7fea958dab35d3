#!/bin/bash
# Round-5 seq15 — after seq14's step A/Bs:
#   small step data: flashGATE alone wins (0.186 vs 0.195 baseline);
#   GROUP_DOTS regresses small (0.244) and is ~neutral-within-combo at
#   large (0.863 GROUP+QHEAD+GATE vs 0.871 QHEAD alone, seq12).
# This sequence:
#   (1) small dense e2e with flashGATE ONLY — the headline-reclaim
#       candidate seq14 skipped (it only ran QHEAD combos), plus a
#       baseline pair in the SAME session for a clean A/B.
#   (2) large SEMANTIC stage decomposition: e2e runs 1.17 ms/token vs
#       the 0.86-0.89 coarse step rate; the step bench isolates how much
#       is the full-vocab LM head + decode vs the chunk kernel's
#       sampling/glue.
#   (3) large e2e kv8 with flashGATE only, and the combined best attempt
#       with a bigger semantic chunk (SEM_CHUNK=32 halves chunk-boundary
#       glue) — the <=0.20 push.
set -u
SNAP=/tmp/bench_repo15
LOG=/root/repo/perf/r5/seq15.log
mkdir -p /root/repo/perf/r5

if [ -f /tmp/seq14.pid ]; then
  while kill -0 "$(cat /tmp/seq14.pid)" 2>/dev/null; do sleep 20; done
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

# --- (0) re-capture the seq14 step A/Bs whose log was lost to a machine
#     reset (conclusions preserved in this file's header; the evidence
#     must exist in the repo, not a commit message — r4's lesson) ---
run "small coarse step baseline" $DB --model small --stage coarse
run "small coarse step flashGATE" env BARK_TPU_ATT_GATE=1 \
  $DB --model small --stage coarse
run "small coarse step GROUP_DOTS" env BARK_TPU_GROUP_DOTS=1 \
  $DB --model small --stage coarse
run "large coarse step GROUP+QHEAD+flashGATE" env BARK_TPU_GROUP_DOTS=1 \
  BARK_TPU_ATT_QHEAD=1 BARK_TPU_ATT_GATE=1 $DB --model large --stage coarse
run "gate quick (flash gate + group dots)" env BARK_TPU_GROUP_DOTS=1 \
  BARK_TPU_ATT_GATE=1 python tools/tpu_check.py --quick

# --- (1) small dense headline A/B, same session ---
run "small dense e2e baseline" python bench.py
run "small dense e2e flashGATE" env BARK_TPU_ATT_GATE=1 python bench.py
run "small dense e2e flashGATE rep" env BARK_TPU_ATT_GATE=1 python bench.py

# --- (2) large semantic step decomposition ---
run "large semantic step baseline" $DB --model large --stage semantic
run "large semantic step flashGATE" env BARK_TPU_ATT_GATE=1 \
  $DB --model large --stage semantic
run "large semantic step kv8+flashGATE" env BARK_TPU_ATT_GATE=1 \
  $DB --model large --stage semantic --kv int8

# --- (3) large e2e pushes ---
# Hypothesis from seq13's stage times (semantic 1.17, coarse 1.05 ms/tok
# e2e vs 0.86-0.89 step-bench): the large MULTI-STEP kernels don't fit
# the default scoped-vmem window (CLAUDE.md: the large semantic chunk
# kernel measured 16.23 MB real) so the planner raises the limit and the
# kernels pay the ~15-20% Mosaic scheduling tax the single-step decode
# kernel avoids. VMEM_DEBUG logs the planner decisions; the kill-switch
# runs fall back to scan-of-single-step-decode + XLA sampling.
run "large e2e kv8 flashGATE (VMEM_DEBUG)" env BARK_TPU_ATT_GATE=1 \
  BARK_TPU_VMEM_DEBUG=1 python bench.py --model large --kv int8 --stage-times
run "large e2e kv8 flashGATE stepped-sem" env BARK_TPU_ATT_GATE=1 \
  BARK_TPU_SEM_KERNEL=0 python bench.py --model large --kv int8 --stage-times
run "large e2e kv8 flashGATE stepped-sem+win" env BARK_TPU_ATT_GATE=1 \
  BARK_TPU_SEM_KERNEL=0 BARK_TPU_WINDOW_KERNEL=0 \
  python bench.py --model large --kv int8 --stage-times
run "large e2e kv8 flashGATE SEM_CHUNK=32" env BARK_TPU_ATT_GATE=1 \
  BARK_TPU_SEM_CHUNK=32 python bench.py --model large --kv int8 --stage-times

echo "=== seq15 done $(date -u) ==="
