#!/bin/bash
# Serial TPU experiment queue: per-row Gram CG A/B (OCFFM_HV_GRAM).
#  1. bench f32, gram on (auto)     3. bench bf16, gram on (auto)
#  2. bench f32, gram off (control) 4. bench bf16, gram off (control)
#  5. 2M-user bf16 gram attempt (gram cache = 2M*1024*2B = 4.1GB -> budget)
cd "$(dirname "$0")/.."
echo "=== 1. bench f32 gram=auto ==="
timeout 1500 python bench.py
echo "=== 2. bench f32 gram=off ==="
OCFFM_HV_GRAM=off timeout 1500 python bench.py
echo "=== 3. bench bf16 gram=auto ==="
BENCH_DTYPE=bfloat16 timeout 1500 python bench.py
echo "=== 4. bench bf16 gram=off ==="
OCFFM_HV_GRAM=off BENCH_DTYPE=bfloat16 timeout 1500 python bench.py
echo "=== 5. 2M users bf16 gram=auto (budget-capped) ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 BENCH_EPOCHS=2 BENCH_DTYPE=bfloat16 \
  timeout 2400 python bench.py
echo "=== queue done ==="
