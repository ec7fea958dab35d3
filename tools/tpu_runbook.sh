#!/bin/bash
# On-TPU validation + bench sequence for the round-4 kernels.
# Probes Mosaic support for the default-off knobs (scalar embed, in-kernel
# EOS while), runs the verification gate (incl. the new packed multi-step
# checks), the bark-large-shaped compile guard, then benches. Stops at the
# first failed gate so a broken kernel never produces a "bench number".
set -u
LOG=/tmp/tpu_runbook.log
cd /root/repo
exec > >(tee -a "$LOG") 2>&1

echo "=== tpu_runbook $(date) ==="

echo "--- mosaic probes (scalar embed / sem while) ---"
timeout 1200 python tools/tpu_mosaic_probe.py
echo "probe rc=$? (informational — gates nothing)"

echo "--- tpu_check --quick ---"
timeout 3600 python tools/tpu_check.py --quick
rc=$?
echo "tpu_check rc=$rc"
if [ $rc -ne 0 ]; then
    echo "GATE FAILED — skipping benches"
    exit 1
fi

echo "--- tpu_check --large (scoped-vmem guard) ---"
timeout 3600 python tools/tpu_check.py --large
echo "large-gate rc=$?"

echo "--- bench small dense ---"
timeout 3600 python bench.py 2>&1 | tail -8

echo "--- bench small q8_0 (packed multi-step kernels) ---"
timeout 3600 python bench.py --quant q8_0 2>&1 | tail -8

echo "--- bench large dense ---"
timeout 3600 python bench.py --model large 2>&1 | tail -8

echo "--- bench large q8_0 ---"
timeout 3600 python bench.py --model large --quant q8_0 2>&1 | tail -8

echo "--- bench batched B=8 int8-KV ---"
timeout 3600 python bench.py --batch 8 --kv int8 2>&1 | tail -8

echo "=== runbook done $(date) ==="
