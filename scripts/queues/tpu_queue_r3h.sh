#!/bin/bash
# Serial TPU queue (round 3, eighth): slot-carry A/B under the kt stack.
cd "$(dirname "$0")/.."
echo "=== 1. bench headline, OCFFM_BLK_YT=0 (stream-order carry under kt) ==="
OCFFM_BLK_YT=0 timeout 1800 python bench.py
echo "=== 2. bench headline, defaults (carry on) ==="
timeout 1800 python bench.py
echo "=== 3. bench 1M x 500k, OCFFM_BLK_YT=0 ==="
OCFFM_BLK_YT=0 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== queue done ==="
