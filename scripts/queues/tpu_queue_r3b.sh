#!/bin/bash
# Serial TPU queue (round 3, second): confirm the fused-table gates
# (min-rows auto + VMEM estimate), re-profile the 1M epoch with the fused
# kernels, and extend to the 2M single-chip config.
cd "$(dirname "$0")/.."
echo "=== 1. bench headline, defaults (fused auto-off below min-rows) ==="
timeout 1500 python bench.py
echo "=== 2. bench headline, OCFFM_FUSED_TBL=1 (VMEM gate must skip the MAXC=13k v-side kernels) ==="
OCFFM_FUSED_TBL=1 timeout 1500 python bench.py
echo "=== 3. bench 1M x 500k, defaults (fused on via min-rows) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== 4. op ablation 1M x 500k bf16 cap-5 (post-fused re-profile) ==="
ABL_VARIANTS=baseline,no_hv_tbl,no_grad_tbl,no_hv_blocked,no_tbl_scatter,no_rows_pre,no_gap,no_scatter_blocked \
  BENCH_DTYPE=bfloat16 BENCH_USERS=1000000 BENCH_ITEMS=500000 \
  timeout 3600 python scripts/ablate_epoch.py
echo "=== 5. bench 2M x 200k, defaults (round-2: 68-75k) ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 3600 python bench.py
echo "=== queue done ==="
