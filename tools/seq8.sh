#!/bin/bash
# Round-4 seq8: (a) auto-dyn default sanity at large (must reproduce
# seq7's forced-DYN 0.2298 from the warm cache); (b) semantic chunk
# levers at large — seq7's stage map shows semantic at 1.39 ms/tok vs
# coarse 1.10 with 9 chunk boundaries at K=16; K=48 and the whole-stage
# EOS-while kernel are the candidates toward dense large < 0.2;
# (c) the extended gate incl. the new batched-dyn check.
set -u
SNAP=/tmp/bench_repo8
LOG=/tmp/seq8.log
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

run "large dense, auto-dyn (cache warm from seq7)" env BARK_TPU_VMEM_DEBUG=1 \
  python bench.py --model large

run "large dense, SEM_CHUNK=48" env BARK_TPU_SEM_CHUNK=48 \
  python bench.py --model large --stage-times

run "large dense, SEM_WHILE=1" env BARK_TPU_SEM_WHILE=1 \
  python bench.py --model large --stage-times

run "tpu_check --quick (incl. batched-dyn)" python tools/tpu_check.py --quick

echo "=== seq8 done $(date -u) ==="
