#!/bin/bash
# Serial TPU queue (round 4, third): CG minor-dim packing (OCFFM_CG_PACK)
# frees ~2.3GB of lane padding at 2M x 200k — retry the full kernel stack
# there (both-sides forced pregather OOM'd in r4a stage 4), and check the
# 1M config (packing auto-engages at >= 2^20-row tables) for regressions.
# RUN ONLY WITH AN IDLE HOST (no parity/pytest — contention corrupts
# numbers).
cd "$(dirname "$0")/../.."
echo "=== 0. gate decisions at 2M x 200k (budget with packed CG set) ==="
BENCH_USERS=2000000 BENCH_ITEMS=200000 OCFFM_DEBUG_GATES=1 \
  timeout 600 python scripts/mem_diag.py
echo "=== 1. bench 2M x 200k, forced 700MB BOTH sides + packed CG"
echo "       (r4a: OOM; the packed S/R/V free ~2.3GB) ==="
OCFFM_DEBUG_GATES=1 OCFFM_BLK_PREGATHER_MB=700 \
  BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 3600 python bench.py
echo "=== 2. bench 2M x 200k, v-side-only pregather + packed CG"
echo "       (r4b unpacked: 115.5k) ==="
OCFFM_DEBUG_GATES=1 OCFFM_BLK_PREGATHER_MB=700 OCFFM_BLK_PREGATHER_SIDE=v \
  BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 3600 python bench.py
echo "=== 3. bench 1M x 500k, packing auto-ON (r4b: 407.4k) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3000 python bench.py
echo "=== 4. bench 1M x 500k, packing OFF (A/B vs 3.) ==="
OCFFM_CG_PACK=0 BENCH_USERS=1000000 BENCH_ITEMS=500000 \
  timeout 3000 python bench.py
echo "=== 5. bench headline (packing auto-off below 2^20 — regression) ==="
timeout 1800 python bench.py
echo "=== queue done ==="
