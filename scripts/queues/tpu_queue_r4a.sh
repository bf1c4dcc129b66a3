#!/bin/bash
# Serial TPU queue (round 4, first): hardware kernel gate + post-refactor
# regression check of the single-chip headline and 1M configs, then the
# 2M x 200k round-3-stack attempts (VERDICT r3 #5,#7).
cd "$(dirname "$0")/../.."
echo "=== 0. hardware kernel gates (writes HW_GATE.json) ==="
timeout 3000 python scripts/hw_gate.py
echo "=== 1. bench headline, defaults (must match r3's 574-598k) ==="
timeout 1800 python bench.py
echo "=== 2. bench 1M x 500k, defaults (r3: 407k) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== 3. bench 2M x 200k, auto budget (expect round-2 path) ==="
OCFFM_DEBUG_GATES=1 BENCH_USERS=2000000 BENCH_ITEMS=200000 \
  timeout 3600 python bench.py
echo "=== 4. bench 2M x 200k, forced pregather cap 700MB (kt streams) ==="
OCFFM_DEBUG_GATES=1 OCFFM_BLK_PREGATHER_MB=700 \
  BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 3600 python bench.py
echo "=== 5. bench zipf-1.0 skew, two-tier head layout (r3: 213.9k) ==="
OCFFM_DEBUG_GATES=1 BENCH_SKEW=1.0 timeout 1800 python bench.py
echo "=== 6. bench zipf-1.0 skew, two-tier DISABLED (r3 baseline ref) ==="
OCFFM_HEAD_CHUNK=0 BENCH_SKEW=1.0 timeout 1800 python bench.py
echo "=== queue done ==="
