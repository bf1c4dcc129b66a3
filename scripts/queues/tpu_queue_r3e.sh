#!/bin/bash
# Serial TPU queue (round 3, fifth): post-kt profile + config sweeps.
cd "$(dirname "$0")/.."
echo "=== 1. bench 2M x 200k, defaults (HBM-aware cap must avoid the OOM) ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 3600 python bench.py
echo "=== 2. op ablation headline bf16 cap-5 (post-kt profile) ==="
ABL_VARIANTS=baseline,no_hv_kt,no_grad_kt,no_gap_kt,no_rows_pre_kt,no_tbl_scatter,no_project \
  BENCH_DTYPE=bfloat16 timeout 3600 python scripts/ablate_epoch.py
echo "=== 3. op ablation 1M x 500k bf16 cap-5 (post-kt profile) ==="
ABL_VARIANTS=baseline,no_hv_kt,no_grad_kt,no_gap_kt,no_rows_pre_kt \
  BENCH_DTYPE=bfloat16 BENCH_USERS=1000000 BENCH_ITEMS=500000 \
  timeout 3600 python scripts/ablate_epoch.py
echo "=== 4. bench headline, BM=512 (kt stream halves grid steps) ==="
BENCH_BLOCKED_BM=512 timeout 1800 python bench.py
echo "=== 5. bench headline, k=128 (round-2: 318.6k; kt is layout-neutral there) ==="
BENCH_K=128 timeout 1800 python bench.py
echo "=== 6. bench headline regression (defaults; expect ~574k) ==="
timeout 1800 python bench.py
echo "=== queue done ==="
