#!/bin/bash
# bf16 Hv-in-f32 experiment: does un-rounded CG input stabilize bf16 CG?
cd "$(dirname "$0")/.."
echo "=== 1. cg_iters bf16 hv-f32 (jacobi vs none) ==="
OCFFM_CG_HV_F32=1 BENCH_DTYPE=bfloat16 timeout 2400 python scripts/cg_iters.py
echo "=== 2. bench bf16 none hv-f32 ==="
OCFFM_CG_HV_F32=1 BENCH_DTYPE=bfloat16 BENCH_CG_PRECOND=none timeout 1500 python bench.py
echo "=== 3. bench bf16 jacobi hv-f32 ==="
OCFFM_CG_HV_F32=1 BENCH_DTYPE=bfloat16 BENCH_CG_PRECOND=jacobi timeout 1500 python bench.py
echo "=== queue done ==="
