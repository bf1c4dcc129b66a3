#!/bin/bash
# Clean serial A/B matrix: {bf16,f32} x {jacobi,none}, gram OFF everywhere,
# then gram=auto on the winner. NOTHING else may run on the host.
cd "$(dirname "$0")/.."
for dt in bfloat16 float32; do
  for pc in jacobi none; do
    echo "=== bench $dt $pc gram=off ==="
    OCFFM_HV_GRAM=off BENCH_DTYPE=$dt BENCH_CG_PRECOND=$pc \
      timeout 1500 python bench.py
  done
done
echo "=== bench bfloat16 jacobi gram=auto ==="
BENCH_DTYPE=bfloat16 BENCH_CG_PRECOND=jacobi timeout 1500 python bench.py
echo "=== queue done ==="
