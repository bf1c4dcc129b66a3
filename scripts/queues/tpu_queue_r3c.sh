#!/bin/bash
# Serial TPU queue (round 3, third): confirm the new auto gates (fused
# everywhere VMEM-fit + per-solve pregather forcing with the HBM cap).
cd "$(dirname "$0")/.."
echo "=== 1. bench headline, defaults (expect ~459k: fused + per-solve pregather) ==="
timeout 1500 python bench.py
echo "=== 2. bench headline, OCFFM_FUSED_TBL_OPS=hv_cross,grad_cross (self-fused contribution A/B) ==="
OCFFM_FUSED_TBL_OPS=hv_cross,grad_cross timeout 1500 python bench.py
echo "=== 3. bench 1M x 500k, defaults (expect ~354k) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== 4. bench 2M x 200k, defaults (HBM cap must avoid the OOM; round-2: 68-75k) ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 3600 python bench.py
echo "=== 5. bench zipf skew 1.0, defaults (round-2: 219.4k) ==="
BENCH_SKEW=1.0 timeout 1500 python bench.py
echo "=== queue done ==="
