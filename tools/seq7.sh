#!/bin/bash
# Round-4 seq7: (a) DMA dual-chain probe — does a second semaphore chain
# lift the ~690 GB/s single-chain plateau toward the 819 GB/s HBM spec?
# (decision datum for W_QUEUES / multi-queue streams in the multi-step
# kernels); (b) large dense under BARK_TPU_DYN_LAYERS=1 with per-stage
# times — the missing RTF that decides the dyn-at-large default and maps
# where the 0.242 is spent.
set -u
SNAP=/tmp/bench_repo7
LOG=/tmp/seq7.log
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

run "dma probe single" python tools/tpu_dma_probe.py --mb 256
run "dma probe dual" python tools/tpu_dma_probe.py --mb 256 --dual

run "large dense DYN=1 + stage times" env BARK_TPU_DYN_LAYERS=1 \
  python bench.py --model large --stage-times

echo "=== seq7 done $(date -u) ==="
