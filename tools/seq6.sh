#!/bin/bash
# Round-4 seq6: validate the conditional-vmem fix on chip + settle numbers.
# Run against a snapshot copy so repo edits don't race the benches.
set -u
SNAP=/tmp/bench_repo6
LOG=/tmp/seq6.log
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

# 1. packed multi-step kernels now take pass 1 (default vmem window) at
#    bark-small — first on-chip compile of that variant; target RTF <=0.065
run "small q8_0, conditional-vmem" env BARK_TPU_VMEM_DEBUG=1 \
  python bench.py --quant q8_0

# 2. the seq5 OOM case: batched multi-step kernels now always raise
run "B=8 int8-KV, batched-raise fix" env BARK_TPU_VMEM_DEBUG=1 \
  python bench.py --batch 8 --kv int8

# 2b. A/B: same config through the r2-style single-step batched kernels
#     (multi-step batched + batched fused prefill OFF) — separates "the
#     multi-step batched path is slower" from session variance vs r2 0.034
run "B=8 int8-KV, single-step kernels (r2 path)" env \
  BARK_TPU_SEM_KERNEL_B=0 BARK_TPU_WINDOW_KERNEL_B=0 BARK_TPU_PREFILL_B=0 \
  python bench.py --batch 8 --kv int8

# 3. headline sanity (cache hot from seq5 for these exact plans)
run "small dense, confirm" python bench.py

# 4. bark-large q8_0 under dynamic layers: RTF cost of dyn at large +
#    cold compile time with L-fold smaller Mosaic programs
run "large q8_0 DYN=1" env BARK_TPU_DYN_LAYERS=1 \
  python bench.py --model large --quant q8_0

# 5. on-TPU gate (tiny shapes; token parity under the new depth plans)
run "tpu_check --quick" python tools/tpu_check.py --quick

echo "=== seq6 done $(date -u) ==="
