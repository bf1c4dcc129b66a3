#!/bin/bash
cd "$(dirname "$0")/.."
echo "=== cg_iters bf16 blocked (jacobi vs none) ==="
BENCH_DTYPE=bfloat16 timeout 2400 python scripts/cg_iters.py
echo "=== serve_bench ==="
timeout 1500 python scripts/serve_bench.py
echo "=== queue done ==="
