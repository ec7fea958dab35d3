#!/bin/bash
# Round-5 seq17 — int8-KV lands in the single-lane multi-step kernels.
# Before r5 the `--kv int8` single-lane pipeline fell back to the stepped
# scan for BOTH GPT stages (supports_* rejected kv_quant) and paid
# ~0.2 ms/token of per-step dispatch+sampling glue at bark-large
# (seq16: coarse 1.05 ms/tok e2e vs the 0.85-0.89 isolated step rate).
# The window/semantic kernels now stream int8 slabs with (L, 1, S) VMEM
# scale state — and at bark-large they plan INSIDE the default scoped-vmem
# window ((2,1), modeled 10.5 MB), dodging the raised-limit scheduling tax
# the bf16 multi-step kernels pay.
#   (0) hardware parity: gate --quick (incl. the new kv8 single-lane
#       checks) and the --large production-shape VMEM compile guard
#       (window60kv8 + chunk16kv8).
#   (1) the <=0.20 attempt: large kv8 e2e (multi-step kernels engaged),
#       plain and +QHEAD, vs seq16's stepped 0.2165.
#   (2) small: kv8 re-run (was 0.069 stepped; multi-step kernels may
#       close the gap to dense 0.064) and the dense headline under the
#       margin-removal code (expect ~0.063 with auto-gate).
set -u
SNAP=/tmp/bench_repo17
LOG=/root/repo/perf/r5/seq17.log
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

# --- (0) hardware parity + production-shape compile guard ---
run "gate quick (kv8 single-lane kernels)" python tools/tpu_check.py --quick
run "gate large (window60kv8 + chunk16kv8)" python tools/tpu_check.py --large

# --- (1) the large <=0.20 attempt ---
run "large e2e kv8 (multi-step kernels)" \
  python bench.py --model large --kv int8 --stage-times
run "large e2e kv8 rep" \
  python bench.py --model large --kv int8 --stage-times
run "large e2e kv8 QHEAD" env BARK_TPU_ATT_QHEAD=1 \
  python bench.py --model large --kv int8 --stage-times

# --- (2) small follow-ups ---
run "small kv8 e2e (multi-step kernels)" python bench.py --kv int8
run "small dense e2e DEFAULT (no gate margin)" python bench.py
run "small dense e2e DEFAULT rep" python bench.py

echo "=== seq17 done $(date -u) ==="
