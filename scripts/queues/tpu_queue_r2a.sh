#!/bin/bash
# Serial TPU experiment queue (one TPU user at a time):
#  1. bench f32 (identity shortcut active)
#  2. bench f32 + Pallas projection kernel on
#  3. bench bf16
#  4. 2M-user bf16 single-chip attempt
cd "$(dirname "$0")/.."
echo "=== 1. bench f32 (identity) ==="
timeout 1500 python bench.py
echo "=== 2. bench f32 + OCFFM_PALLAS=1 ==="
OCFFM_PALLAS=1 timeout 1500 python bench.py
echo "=== 3. bench bf16 ==="
BENCH_DTYPE=bfloat16 timeout 1500 python bench.py
echo "=== 4. 2M users bf16 ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 BENCH_EPOCHS=2 BENCH_DTYPE=bfloat16 \
  timeout 2400 python bench.py
echo "=== queue done ==="
