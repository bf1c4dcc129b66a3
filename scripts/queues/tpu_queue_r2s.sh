#!/bin/bash
# Serial TPU queue: where does the LARGE-config epoch actually go?
# Op ablation at 1M x 500k (fixed cap-5 CG so every variant runs the same
# schedule) + prefetch-granularity A/B at the same config.
cd "$(dirname "$0")/.."
echo "=== 1. op ablation, 1M x 500k bf16, cap-5 ==="
ABL_VARIANTS=baseline,no_hv_blocked,no_scatter_blocked,no_rows_pre,no_tbl_scatter,no_project \
BENCH_USERS=1000000 BENCH_ITEMS=500000 BENCH_DTYPE=bfloat16 BENCH_EPOCHS=2 \
timeout 4800 python scripts/ablate_epoch.py
echo "=== 2. bench 1M x 500k, BLK_PREFETCH=256MB ==="
OCFFM_BLK_PREFETCH=$((1<<28)) BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 3. bench 1M x 500k, BLK_PREFETCH=1GB ==="
OCFFM_BLK_PREFETCH=$((1<<30)) BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== queue done ==="
