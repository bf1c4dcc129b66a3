#!/bin/bash
# Serial TPU queue (round 3, sixth): 400MB stream-cap validation + kt_v
# VMEM headroom A/B.
cd "$(dirname "$0")/.."
echo "=== 1. bench 2M x 200k, defaults (cap 400MB -> no pregather; round-2: 68-75k) ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 3600 python bench.py
echo "=== 2. bench 1M x 500k regression (streams 352/320MB still under cap) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== 3. bench headline, OCFFM_FUSED_TBL_VMEM_MB=13 (kt_v est 10.2MB -> v-side solves go fused) ==="
OCFFM_FUSED_TBL_VMEM_MB=13 timeout 1800 python bench.py
echo "=== 4. bench headline regression (defaults) ==="
timeout 1800 python bench.py
echo "=== queue done ==="
