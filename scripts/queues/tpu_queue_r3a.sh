#!/bin/bash
# Serial TPU queue (round 3, first): validate + A/B the fused table-space
# kernels (OCFFM_FUSED_TBL) at the headline and large configs.
# Within-queue pairs only (cross-queue deltas < ~10% are chip noise).
cd "$(dirname "$0")/.."
echo "=== 0a. fused-table per-op hardware gate (f32, forced) ==="
timeout 1800 python scripts/fused_debug.py || exit 1
echo "=== 0b. fused-table training smoke (f32, forced) ==="
timeout 1800 python scripts/fused_smoke.py || exit 1
echo "=== 1. bench headline, defaults (self-solves fused, cross unfused) ==="
timeout 1500 python bench.py
echo "=== 2. bench headline, OCFFM_FUSED_TBL=0 (round-2 shipped config) ==="
OCFFM_FUSED_TBL=0 timeout 1500 python bench.py
echo "=== 3. bench headline, OCFFM_FUSED_TBL=1 (forces pregather -> cross fused too) ==="
OCFFM_FUSED_TBL=1 timeout 1500 python bench.py
echo "=== 4. bench 1M x 500k, defaults (pregather auto-on -> fully fused) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== 5. bench 1M x 500k, OCFFM_FUSED_TBL=0 (A/B) ==="
OCFFM_FUSED_TBL=0 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== queue done ==="
