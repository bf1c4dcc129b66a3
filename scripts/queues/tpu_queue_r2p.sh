#!/bin/bash
# Serial TPU queue: epoch-level A/B of the Mosaic hv kernel (pallas_hv),
# the pre-permuted weights + fused omega term in the XLA blocked path, and
# block-size sensitivity.  One job at a time, host otherwise idle.
cd "$(dirname "$0")/.."
echo "=== 1. XLA blocked + w_blk + dense fusion (pallas off) ==="
OCFFM_PALLAS_HV=0 timeout 1800 python bench.py
echo "=== 2. Mosaic hv kernel (default auto = on) ==="
timeout 1800 python bench.py
echo "=== 3. Mosaic hv + BM=128 ==="
BENCH_BLOCKED_BM=128 timeout 1800 python bench.py
echo "=== 4. Mosaic hv + BM=512 ==="
BENCH_BLOCKED_BM=512 timeout 1800 python bench.py
echo "=== 5. large config 1M x 500k, Mosaic hv ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== 6. large config 1M x 500k, pallas off (pregather auto on) ==="
OCFFM_PALLAS_HV=0 BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 2400 python bench.py
echo "=== queue done ==="
