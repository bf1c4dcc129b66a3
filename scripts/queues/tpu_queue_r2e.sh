#!/bin/bash
# Fused-diag jacobi A/B + on-device CG iteration counts.
cd "$(dirname "$0")/.."
echo "=== 1. bench bf16 jacobi (fused diag) ==="
BENCH_DTYPE=bfloat16 BENCH_CG_PRECOND=jacobi timeout 1500 python bench.py
echo "=== 2. bench f32 jacobi (fused diag) ==="
BENCH_DTYPE=float32 BENCH_CG_PRECOND=jacobi timeout 1500 python bench.py
echo "=== 3. cg_iters bf16 (jacobi vs none) ==="
BENCH_DTYPE=bfloat16 timeout 2400 python scripts/cg_iters.py
echo "=== queue done ==="
