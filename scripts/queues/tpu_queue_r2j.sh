#!/bin/bash
# Paired A/B for the group-prefetch blocked ops (within one queue run).
cd "$(dirname "$0")/.."
for dt in bfloat16 float32; do
  echo "=== bench $dt blocked (prefetch) ==="
  BENCH_DTYPE=$dt timeout 1500 python bench.py
  echo "=== bench $dt blocked OFF ==="
  BENCH_DTYPE=$dt BENCH_BLOCKED_BM=0 timeout 1500 python bench.py
done
echo "=== queue done ==="
