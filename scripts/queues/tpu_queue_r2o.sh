#!/bin/bash
cd "$(dirname "$0")/.."
echo "=== 0. verify ==="
/tmp/verify_r2.sh >/tmp/verify_r2f.log 2>&1 && echo "verify: OK" || echo "verify: FAILED"
echo "=== 1. bench onehot_chunk=16384 ==="
OCFFM_ONEHOT_CHUNK=16384 timeout 1800 python bench.py
echo "=== 2. bench onehot_chunk=32768 ==="
OCFFM_ONEHOT_CHUNK=32768 timeout 1800 python bench.py
echo "=== 3. bench pop_skew=1.0 ==="
BENCH_SKEW=1.0 timeout 1800 python bench.py
echo "=== 4. bench k=128 ==="
BENCH_K=128 timeout 1800 python bench.py
echo "=== queue done ==="
