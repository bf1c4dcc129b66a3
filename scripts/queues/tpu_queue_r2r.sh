#!/bin/bash
# Serial TPU queue: refresh the headline after pad-dropping layouts + auto
# rules; re-test the big single-chip configs on the fused path.
cd "$(dirname "$0")/.."
echo "=== 1. default bench (drop-pads layouts, auto rules) ==="
timeout 1800 python bench.py
echo "=== 2. 2M users x 200k items (single-chip ceiling config) ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 2400 python bench.py
echo "=== 3. 1M x 500k default (pallas rides pregather) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 4. pop-skew 1.0 default ==="
BENCH_SKEW=1.0 timeout 1800 python bench.py
echo "=== queue done ==="
