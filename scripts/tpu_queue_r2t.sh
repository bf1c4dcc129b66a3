#!/bin/bash
# Serial TPU queue: epoch-level A/B of the blocked residual gap
# (pos_gap_blocked) + pre-permuted diag weights at the large config, plus
# scatter-chunk and BM FLOPs probes, and a headline regression check.
# Within-queue pairs only (cross-queue deltas < ~10% are chip noise).
cd "$(dirname "$0")/.."
echo "=== 1. bench 1M x 500k, defaults (blk gap ON) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 2. bench 1M x 500k, OCFFM_BLK_GAP=0 (isolate the gap op) ==="
OCFFM_BLK_GAP=0 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 3. bench 1M x 500k, OCFFM_ONEHOT_CHUNK=65536 ==="
OCFFM_ONEHOT_CHUNK=65536 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 4. bench 1M x 500k, BENCH_BLOCKED_BM=128 ==="
BENCH_BLOCKED_BM=128 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 5. bench 1M x 500k, OCFFM_BLK_PREFETCH=256MB (vs step 1's 512MB default) ==="
OCFFM_BLK_PREFETCH=268435456 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 6. bench 200k x 20k headline, defaults (regression check) ==="
timeout 2400 python bench.py
echo "=== queue done ==="
