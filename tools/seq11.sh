#!/bin/bash
# Round-5 seq11 — the measurement half of VERDICT r4's next-round list:
#
# (5) warm-start breakdown (tools/warmstart_profile.py): split the fresh-
#     process ~36-100 s residual into persistent-cache reads vs backend
#     compiles vs tracing/dispatch, small dense + large q8_0 (the two
#     serving configs), twice each for variance.
# (6) batched-serving scaling table: B in {1,8,16,32} on the single-lane
#     workload, per-request RTF + aggregate audio-s/s (bench --batch-sweep),
#     int8-KV like the r4 headline batched number.
# (8) time-to-first-audio at B=1 through the streaming pipeline.
# (+) int8-KV single-lane dense at both sizes — the one traffic lever the
#     single-lane dense benches have never measured (KV slab stream is
#     ~10-15% of decode HBM traffic; int8 halves it).
set -u
SNAP=/tmp/bench_repo11
LOG=/root/repo/perf/r5/seq11.log
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

# --- warm-start breakdown (fresh process each; cache is hot from seq10) ---
run "warmstart small dense (1/2)" python tools/warmstart_profile.py
run "warmstart small dense (2/2)" python tools/warmstart_profile.py
run "warmstart large q8_0" python tools/warmstart_profile.py \
  --model large --quant q8_0

# --- int8-KV single-lane dense (never measured single-lane) ---
run "small dense int8-KV" python bench.py --kv int8
run "large dense int8-KV" python bench.py --model large --kv int8 --stage-times

# --- time-to-first-audio (streaming pipeline, B=1) ---
run "TTFA small dense" python bench.py --ttfa

# --- batched-serving scaling table (int8-KV, like the r4 B=8 number) ---
run "batch sweep int8-KV" python bench.py --kv int8 --batch-sweep 1,8,16,32

echo "=== seq11 done $(date -u) ==="
