#!/bin/bash
# Robust re-validation of the cg_precond decision numbers.
cd "$(dirname "$0")/.."
echo "=== f32 cg=none blocked-off (robust) ==="
BENCH_DTYPE=float32 BENCH_CG_PRECOND=none BENCH_BLOCKED_BM=0 timeout 1800 python bench.py
echo "=== f32 cg=none blocked (robust) ==="
BENCH_DTYPE=float32 BENCH_CG_PRECOND=none timeout 1800 python bench.py
echo "=== bf16 cg=jacobi blocked (robust) ==="
BENCH_DTYPE=bfloat16 BENCH_CG_PRECOND=jacobi timeout 1800 python bench.py
echo "=== queue done ==="
