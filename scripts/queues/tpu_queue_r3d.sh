#!/bin/bash
# Serial TPU queue (round 3, fourth): k-major kernel stack — hardware gate
# then clean A/Bs with the new defaults (pregather-everywhere + kt + fused).
cd "$(dirname "$0")/.."
echo "=== 0. kt per-op hardware gate (f32) ==="
timeout 1800 python scripts/kt_debug.py || exit 1
echo "=== 1. bench headline, defaults (kt + fused + pregather + carry) ==="
timeout 1800 python bench.py
echo "=== 2. bench headline, OCFFM_KT=0 (row-major A/B: expect ~459k) ==="
OCFFM_KT=0 timeout 1800 python bench.py
echo "=== 3. bench 1M x 500k, defaults ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== 4. bench 1M x 500k, OCFFM_KT=0 (A/B) ==="
OCFFM_KT=0 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== 5. bench 2M x 200k, defaults (kt stream fits the HBM cap now) ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 3600 python bench.py
echo "=== 6. bench zipf skew 1.0, defaults (round-2: 219.4k) ==="
BENCH_SKEW=1.0 timeout 1800 python bench.py
echo "=== queue done ==="
