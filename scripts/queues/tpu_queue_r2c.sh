#!/bin/bash
# Serial TPU queue: CLI verify, Jacobi-PCG A/B, f32 numbers, gram micro.
cd "$(dirname "$0")/.."
echo "=== 0. verify recipe ==="
/tmp/verify_r2.sh && echo "verify: OK" || echo "verify: FAILED"
echo "=== 1. bench default (bf16, jacobi, gram auto) ==="
timeout 1500 python bench.py
echo "=== 2. bench bf16 cg_precond=none ==="
BENCH_CG_PRECOND=none timeout 1500 python bench.py
echo "=== 3. bench f32 jacobi ==="
BENCH_DTYPE=float32 timeout 1500 python bench.py
echo "=== 4. bench f32 none ==="
BENCH_DTYPE=float32 BENCH_CG_PRECOND=none timeout 1500 python bench.py
echo "=== 5. gram micro unroll (skip einsum) ==="
GM_SKIP_EINSUM=1 timeout 1800 python scripts/gram_micro.py
echo "=== 6. 2M users bf16 jacobi ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 BENCH_EPOCHS=2 \
  timeout 2400 python bench.py
echo "=== queue done ==="
