#!/bin/bash
# Round-5 FINAL regression queue, re-run after the tunnel outage
# (docs/PERF.md "Round 5 final queue — TPU outage disclosure").
# Serial, one process at a time on the single tunneled chip:
#   1. headline 200k x 20k under the shipped plain-CG auto default
#      (run separately before this script; logged alongside)
#   2. its jacobi A/B (the measured cost of the reference-exact default)
#   3. zipf-1.0 skew regression (two-tier layout, plain-CG default)
#   4. 1M x 500k web-scale regression (plain-CG default, auto CG_PACK)
set -u
cd "$(dirname "$0")/../.."
LOG=/tmp/r5d
mkdir -p "$LOG"

echo "=== 2: headline, jacobi opt-in A/B ==="
BENCH_CG_PRECOND=jacobi timeout 1800 python bench.py \
  > "$LOG/headline_jacobi.log" 2>&1
echo "2 rc=$?"

echo "=== 3: zipf-1.0 skew, shipped default ==="
BENCH_SKEW=1.0 timeout 1800 python bench.py \
  > "$LOG/zipf.log" 2>&1
echo "3 rc=$?"

echo "=== 4: 1M x 500k, shipped default ==="
BENCH_USERS=1000000 BENCH_ITEMS=500000 timeout 3600 python bench.py \
  > "$LOG/1m.log" 2>&1
echo "4 rc=$?"
echo "=== r5d queue done ==="
