#!/bin/bash
# Ablation at bf16: where does the epoch go now? cap5 and cap1 separate
# per-CG-iteration costs from per-solve fixed costs.
cd "$(dirname "$0")/.."
echo "=== ablate bf16 cap5 ==="
BENCH_DTYPE=bfloat16 ABL_CAP=5 timeout 3000 python scripts/ablate_epoch.py
echo "=== ablate bf16 cap1 ==="
BENCH_DTYPE=bfloat16 ABL_CAP=1 timeout 3000 python scripts/ablate_epoch.py
echo "=== queue done ==="
