#!/bin/bash
# Serial TPU queue: measure the slot-order residual carry (OCFFM_BLK_YT,
# shipped in b0d400a) at the large config where its scalar-gather savings
# matter, regression-check the headline, then re-profile the large epoch.
# Within-queue pairs only (cross-queue deltas < ~10% are chip noise).
cd "$(dirname "$0")/.."
echo "=== 1. bench 200k x 20k headline, defaults (regression check) ==="
timeout 1500 python bench.py
echo "=== 2. bench 1M x 500k, defaults (slot-order yt ON) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 3. bench 1M x 500k, OCFFM_BLK_YT=0 (stream carry A/B) ==="
OCFFM_BLK_YT=0 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 4. op ablation, 1M x 500k bf16, cap-5 (post yt-carry re-profile) ==="
ABL_VARIANTS=baseline,no_scatter_blocked,no_hv_blocked,no_tbl_scatter,no_gap,no_rows_pre \
  BENCH_DTYPE=bfloat16 BENCH_USERS=1000000 BENCH_ITEMS=500000 \
  timeout 3600 python scripts/ablate_epoch.py
echo "=== queue done ==="
