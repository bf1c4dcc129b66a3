#!/bin/bash
# Serial TPU queue: headline-config probe of the slot-order carry.  At
# 200k x 20k the pregather auto-gate is OFF (both caches are below
# OCFFM_BLK_PREGATHER_MIN_ROWS), which also keeps OCFFM_BLK_YT off; forcing
# pregather (measured -4% on its own) enables the carry — does the saved
# per-solve coefficient gather pay for the forced pregather?
# Within-queue pairs only (cross-queue deltas < ~10% are chip noise).
cd "$(dirname "$0")/.."
echo "=== 1. headline, defaults (pregather off, yt carry off) ==="
timeout 1500 python bench.py
echo "=== 2. headline, OCFFM_BLK_PREGATHER=1 (forces pregather; yt carry auto-engages) ==="
OCFFM_BLK_PREGATHER=1 timeout 1500 python bench.py
echo "=== 3. headline, OCFFM_BLK_PREGATHER=1 OCFFM_BLK_YT=0 (isolate the carry's share) ==="
OCFFM_BLK_PREGATHER=1 OCFFM_BLK_YT=0 timeout 1500 python bench.py
echo "=== queue done ==="
