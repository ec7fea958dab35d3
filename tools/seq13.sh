#!/bin/bash
# Round-5 seq13 — (1) the DEPENDENT-chain dot probe that decides the
# grouped-transposed-dot kernel surgery (seq12 ablations: attention math
# is only 0.059 ms/token at large and KV DMA is free; the remaining
# ~0.13 ms/token over the HBM floor is the serial dot/LN/GELU chain);
# (2) hardware gate over the refactored _attend_lane (+ the new
# check_att_flags); (3) the AOT program-cache warm-start A/B (seq11: 97%
# of a warm start is tracing/lowering; utils/aot.py caches the export);
# (4) QHEAD / int8-KV e2e combos for the best large-dense number.
set -u
SNAP=/tmp/bench_repo13
LOG=/root/repo/perf/r5/seq13.log
mkdir -p /root/repo/perf/r5

if [ -f /tmp/seq12.pid ]; then
  while kill -0 "$(cat /tmp/seq12.pid)" 2>/dev/null; do sleep 20; done
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

# --- (1) dependent-chain per-op overhead: group 1 vs 2 vs 4 vs 12 ---
run "chain probe (dependent dots)" python tools/tpu_dma_probe.py \
  --mb 256 --rows 1024 --rings 4,12 --chain 1,2,4,12

# --- (2) hardware gate over the refactored attention (+ new check) ---
run "gate quick (refactored _attend_lane + check_att_flags)" \
  python tools/tpu_check.py --quick

# --- (3) AOT warm-start A/B (fresh process each run) ---
# run A: AOT off, pays the one-time kernel/XLA recompile for the
# refactored code; run B: AOT off, fully warm = the CONTROL number;
# run C: AOT on, exports blobs; run D: AOT on, reloads = the HEADLINE.
run "warm A: AOT=0 (recompile pass)" env BARK_TPU_AOT=0 python bench.py
run "warm B: AOT=0 control" env BARK_TPU_AOT=0 python bench.py
run "warm C: AOT=1 export pass" env BARK_TPU_AOT=1 python bench.py
run "warm D: AOT=1 reload (headline)" env BARK_TPU_AOT=1 python bench.py
run "warm D2: AOT=1 reload repeat" env BARK_TPU_AOT=1 python bench.py

# --- (4) lever e2e combos ---
run "small dense QHEAD e2e" env BARK_TPU_ATT_QHEAD=1 python bench.py
run "large dense kv8 QHEAD e2e (best-large attempt)" \
  env BARK_TPU_ATT_QHEAD=1 python bench.py --model large --kv int8 \
  --stage-times

echo "=== seq13 done $(date -u) ==="
