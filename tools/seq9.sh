#!/bin/bash
# Round-4 seq9: (a) price per-MXU-op overhead in the weight stream — the
# decisive datum for the op-level dot-fusion (wide-dot) kernel candidate:
# --dot (per-tile dots, the kernels' pattern) vs --dotgroup 4 (one dot
# per 4 consecutive slots) vs the pure stream (seq7: 824-927 GB/s);
# (b) hardware-validate the Mosaic strip-debuginfo patch (gate + bench);
# (c) prove kernel caches now survive code edits: bench, re-bench warm,
# then shift every line number in decode.py and re-bench — warm-up must
# stay in the warm range (pre-patch this was a full ~600-950 s recompile).
set -u
SNAP=/tmp/bench_repo9
LOG=/tmp/seq9.log
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

run "dot probe (per-tile dots)" python tools/tpu_dma_probe.py \
  --mb 256 --rows 512,1024 --rings 4,8 --dot
run "dotgroup-4 probe (fused dots)" python tools/tpu_dma_probe.py \
  --mb 256 --rows 512,1024 --rings 4,8 --dotgroup 4

run "tpu_check --quick under strip-locs" python tools/tpu_check.py --quick

run "small dense, repopulate stripped cache" python bench.py
run "small dense, warm (same code)" python bench.py

# shift every line number below line 30 of decode.py; tokens/programs are
# content-identical, so the warm-up must stay warm
sed -i '30i # cache-survival probe: this comment shifts every line below' \
  bark_tpu/kernels/decode.py
run "small dense, warm AFTER line-shift edit" python bench.py

echo "=== seq9 done $(date -u) ==="
