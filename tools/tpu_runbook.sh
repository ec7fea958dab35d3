#!/bin/bash
# Post-outage validation + bench sequence for the round-3 kernels.
# Run on the real chip (waits for nothing itself): probes Mosaic support
# for the semantic while-variant, runs the full on-TPU verification gate,
# then benches. Stops at the first failed gate so a broken kernel never
# produces a "bench number".
set -u
LOG=/tmp/tpu_runbook.log
cd /root/repo
exec > >(tee -a "$LOG") 2>&1

echo "=== tpu_runbook $(date) ==="

echo "--- mosaic probes ---"
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

echo "--- bench small dense ---"
timeout 3600 python bench.py 2>&1 | tail -20

echo "--- bench large dense ---"
timeout 3600 python bench.py --model large 2>&1 | tail -20

echo "--- bench large dense stage-times ---"
timeout 3600 python bench.py --model large --stage-times 2>&1 | tail -30

echo "=== runbook done $(date) ==="
