#!/bin/bash
# f32 split-dispatch A/B + bf16 confirm + 2M robust.
cd "$(dirname "$0")/.."
echo "=== bench f32 blocked-hv + fused-pair grad ==="
BENCH_DTYPE=float32 timeout 1800 python bench.py
echo "=== bench f32 blocked OFF ==="
BENCH_DTYPE=float32 BENCH_BLOCKED_BM=0 timeout 1800 python bench.py
echo "=== bench bf16 default (confirm) ==="
timeout 1800 python bench.py
echo "=== 2M users bf16 robust ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 BENCH_EPOCHS=2 BENCH_REPS=2 \
  timeout 3000 python bench.py
echo "=== queue done ==="
