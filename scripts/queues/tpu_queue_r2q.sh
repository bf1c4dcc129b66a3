#!/bin/bash
# Serial TPU queue: Mosaic hv kernel A/B after the (n_blocks,1,MAXC)
# block-spec fix, block-size sensitivity, k=128 layout check.
cd "$(dirname "$0")/.."
echo "=== 1. Mosaic hv kernel (default auto = on) ==="
timeout 1800 python bench.py
echo "=== 2. Mosaic hv + BM=128 ==="
BENCH_BLOCKED_BM=128 timeout 1800 python bench.py
echo "=== 3. XLA blocked + BM=128 (pallas off) ==="
OCFFM_PALLAS_HV=0 BENCH_BLOCKED_BM=128 timeout 1800 python bench.py
echo "=== 4. large config 1M x 500k, Mosaic hv ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 5. k=128 (Mosaic hv default) ==="
BENCH_K=128 timeout 2400 python bench.py
echo "=== queue done ==="
