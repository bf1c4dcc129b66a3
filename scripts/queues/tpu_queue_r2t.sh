#!/bin/bash
# Serial TPU queue: epoch-level A/B of the slot-order residual carry
# (OCFFM_BLK_YT), the blocked residual gap (pos_gap_blocked) and the
# pre-permuted diag weights at the large config, plus scatter-chunk, BM and
# prefetch probes, and a headline regression check.
# Within-queue pairs only (cross-queue deltas < ~10% are chip noise).
cd "$(dirname "$0")/.."
echo "=== 1. bench 1M x 500k, defaults (slot-order yt ON) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 2. bench 1M x 500k, OCFFM_BLK_YT=0 (stream carry, blocked gap ON) ==="
OCFFM_BLK_YT=0 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 3. bench 1M x 500k, OCFFM_BLK_GAP=0 (plain pos_dot gaps, stream carry) ==="
OCFFM_BLK_GAP=0 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 4. bench 1M x 500k, OCFFM_ONEHOT_CHUNK=65536 ==="
OCFFM_ONEHOT_CHUNK=65536 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 5. bench 1M x 500k, BENCH_BLOCKED_BM=128 ==="
BENCH_BLOCKED_BM=128 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 6. bench 1M x 500k, OCFFM_BLK_PREFETCH=256MB (vs step 1's 512MB default) ==="
OCFFM_BLK_PREFETCH=268435456 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 7. bench 200k x 20k headline, defaults (regression check) ==="
timeout 2400 python bench.py
echo "=== 8. op ablation, 1M x 500k bf16, cap-5 (post yt-carry re-profile) ==="
ABL_VARIANTS=baseline,no_scatter_blocked,no_hv_blocked,no_tbl_scatter,no_gap,no_rows_pre \
  BENCH_DTYPE=bfloat16 BENCH_USERS=1000000 BENCH_ITEMS=500000 \
  timeout 3600 python scripts/ablate_epoch.py
echo "=== queue done ==="
