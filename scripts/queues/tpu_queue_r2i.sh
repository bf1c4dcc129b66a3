#!/bin/bash
cd "$(dirname "$0")/.."
echo "=== blocked micro f32 ==="
timeout 2400 python scripts/blocked_micro.py
echo "=== blocked micro bf16 ==="
GM_DTYPE=bf16 timeout 2400 python scripts/blocked_micro.py
echo "=== queue done ==="
