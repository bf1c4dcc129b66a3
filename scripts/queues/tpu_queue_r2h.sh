#!/bin/bash
# Blocked-sorted positive ops A/B on the real chip.
cd "$(dirname "$0")/.."
echo "=== 1. bench bf16 blocked (default) ==="
timeout 1500 python bench.py
echo "=== 2. bench bf16 blocked OFF (control) ==="
BENCH_BLOCKED_BM=0 timeout 1500 python bench.py
echo "=== 3. bench f32 blocked (jacobi fused) ==="
BENCH_DTYPE=float32 timeout 1500 python bench.py
echo "=== 4. bench f32 blocked OFF ==="
BENCH_DTYPE=float32 BENCH_BLOCKED_BM=0 timeout 1500 python bench.py
echo "=== queue done ==="
