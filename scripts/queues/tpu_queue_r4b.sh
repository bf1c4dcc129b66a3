#!/bin/bash
# Serial TPU queue (round 4, second): re-measure 1M x 500k after the
# donation-aware static HBM budget fix (the 2x-state model zeroed the
# pregather cap there and cost 4x: 109.9k vs r3's 407k), A/B the batched
# gap kernel (OCFFM_BLK_GAP_G) at both scales, and a zipf profile.
cd "$(dirname "$0")/../.."
echo "=== 0. gate decisions at 1M x 500k (must show pregather/kt ON) ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 OCFFM_DEBUG_GATES=1 \
  timeout 600 python scripts/mem_diag.py
echo "=== 1. bench 1M x 500k, fixed budget (r3: 407k; r4a broken: 110k) ==="
OCFFM_DEBUG_GATES=1 BENCH_USERS=1000000 BENCH_ITEMS=500000 \
  timeout 3000 python bench.py
echo "=== 2. bench 1M x 500k, gap batching OFF (A/B vs 1.) ==="
OCFFM_BLK_GAP_G=1 BENCH_USERS=1000000 BENCH_ITEMS=500000 \
  timeout 3000 python bench.py
echo "=== 3. bench headline, gap batching OFF (A/B vs r4a's 602.0k) ==="
OCFFM_BLK_GAP_G=1 timeout 1800 python bench.py
echo "=== 4. bench zipf-1.0, min-cost two-tier (r4a old search: 302.9k;"
echo "       disabled: 214.1k; kt/fused now engage at tail maxc ~8k) ==="
OCFFM_DEBUG_GATES=1 BENCH_SKEW=1.0 timeout 1800 python bench.py
echo "=== 5. bench 2M x 200k, v-side-only pregather (one 640MB stream"
echo "       live; both-sides at cap 700MB OOM'd in r4a stage 4) ==="
OCFFM_DEBUG_GATES=1 OCFFM_BLK_PREGATHER_MB=700 OCFFM_BLK_PREGATHER_SIDE=v \
  BENCH_USERS=2000000 BENCH_ITEMS=200000 timeout 3600 python bench.py
echo "=== queue done ==="
