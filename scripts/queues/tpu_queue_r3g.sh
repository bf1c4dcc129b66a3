#!/bin/bash
# Serial TPU queue (round 3, seventh): skew pad-ratio A/B + epoch split.
cd "$(dirname "$0")/.."
echo "=== 1. bench zipf 1.0, defaults (ratio 2.0 -> v-side layout rejected; prior: 213.9k) ==="
BENCH_SKEW=1.0 timeout 1800 python bench.py
echo "=== 2. bench zipf 1.0, OCFFM_BLK_PAD_RATIO=4 ==="
OCFFM_BLK_PAD_RATIO=4 BENCH_SKEW=1.0 timeout 1800 python bench.py
echo "=== 3. bench zipf 1.0, OCFFM_BLK_PAD_RATIO=8 ==="
OCFFM_BLK_PAD_RATIO=8 BENCH_SKEW=1.0 timeout 1800 python bench.py
echo "=== 4. epoch split headline (fixed vs per-CG-iteration cost) ==="
BENCH_DTYPE=bfloat16 timeout 2400 python scripts/profile_epoch.py
echo "=== queue done ==="
