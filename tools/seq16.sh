#!/bin/bash
# Round-5 seq16 — the focused pushes after seq15:
#   (0) gate --quick under PURE DEFAULTS: the flash attention gate is now
#       auto-on for single-lane D<=768 kernels (seq15: small step 0.179
#       vs 0.192, e2e 0.0634 vs 0.0642 twice) — hardware parity must hold
#       under the new defaults before any number below counts.
#   (1) small dense headline under the new default (plus a GATE=0 control
#       in-session), and packed q8_0 small under the default (does the
#       gate stack with the r4-best 0.0591 packed config?).
#   (2) the large <=0.20 push: seq15's section 3 never ran — every
#       kv8+flashGATE e2e hit the 24 KB scoped-vmem overflow (real stack
#       16.02 MB vs the 16.00 default window). Root cause fixed: the
#       planners priced weight tiles at the KV-cache itemsize (HALF real
#       under int8-KV + bf16 weights); large kv8 decode now plans (3,1)
#       with real headroom instead of (4,2) at the exact window edge.
#       Baseline re-run first (the plan change must be A/B'd), then
#       +flashGATE, then +SEM_CHUNK=32, then the stepped-sem diagnostic.
set -u
SNAP=/tmp/bench_repo16
LOG=/root/repo/perf/r5/seq16.log
mkdir -p /root/repo/perf/r5

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

# --- (0) hardware parity under the new defaults ---
run "gate quick DEFAULTS (auto att-gate)" python tools/tpu_check.py --quick

# --- (1) small headline under the new default (auto gate) ---
run "small dense e2e DEFAULT (auto gate)" python bench.py
run "small dense e2e DEFAULT rep" python bench.py
run "small dense e2e GATE=0 control" env BARK_TPU_ATT_GATE=0 python bench.py
run "small q8_0 packed DEFAULT (auto gate)" python bench.py --quant q8_0
run "small q8_0 packed GATE=0 control" env BARK_TPU_ATT_GATE=0 \
  python bench.py --quant q8_0

# --- (2) the large <=0.20 push ---
run "large e2e kv8 QHEAD baseline (new 3,1 plan)" env BARK_TPU_ATT_QHEAD=1 \
  python bench.py --model large --kv int8 --stage-times
run "large e2e kv8 QHEAD+flashGATE" env BARK_TPU_ATT_QHEAD=1 \
  BARK_TPU_ATT_GATE=1 python bench.py --model large --kv int8 --stage-times
run "large e2e kv8 QHEAD+flashGATE SEM_CHUNK=32" env BARK_TPU_ATT_QHEAD=1 \
  BARK_TPU_ATT_GATE=1 BARK_TPU_SEM_CHUNK=32 \
  python bench.py --model large --kv int8 --stage-times

# --- multi-step VMEM-tax diagnostic (one run): semantic stage falls back
#     to scan-of-single-step decode + XLA sampling ---
run "large e2e kv8 QHEAD stepped-sem" env BARK_TPU_ATT_QHEAD=1 \
  BARK_TPU_SEM_KERNEL=0 python bench.py --model large --kv int8 \
  --stage-times

echo "=== seq16 done $(date -u) ==="
