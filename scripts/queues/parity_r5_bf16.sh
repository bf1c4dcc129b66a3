#!/bin/bash
# Round-5 sweep-tier parity, bf16 track — OUR side runs on the real TPU
# (the shipped configuration; near-zero host CPU so it overlaps the f32
# CPU matrix), every reference run served from the shared cache (seeded
# from the f32 runs — scripts/seed_ref_cache.py / --ref-cache).
# Serial on the chip; each run pays the ~8-9 min remote compile.
set -u
cd "$(dirname "$0")/../.."
CACHE=/root/ref_cache
LOGS=docs/parity_logs
mkdir -p "$LOGS"

echo "=== bf16 k16: ffm-ffm + ffm-ffm--ns, N=10 (refs cached) ==="
timeout 43200 python scripts/parity_check.py --tier sweep --seeds 10 \
  --variants ffm-ffm,ffm-ffm--ns --grid "16:4:0.00048828125" \
  --our-dtype bfloat16 --our-platform auto \
  --ref-cache "$CACHE" > "$LOGS/parity_k16_bf16.log" 2>&1
echo "bf16-k16 rc=$?"

# k32 cell: wait for the f32 CPU track to have cached the references
# (ref runs on the host would contend with the running f32 matrix)
for i in $(seq 1 720); do
  n=$(grep -c "our=" docs/parity_logs/parity_k32_ns_f32.log 2>/dev/null || echo 0)
  [ "$n" -ge 10 ] && break
  sleep 60
done
echo "=== bf16 k32: ffm-ffm--ns, N=10 (refs cached by the f32 track) ==="
timeout 43200 python scripts/parity_check.py --tier sweep --seeds 10 \
  --variants ffm-ffm--ns --grid "32:1:0.03125" \
  --our-dtype bfloat16 --our-platform auto \
  --ref-cache "$CACHE" > "$LOGS/parity_k32_ns_bf16.log" 2>&1
echo "bf16-k32 rc=$?"
echo "=== parity_r5_bf16 queue done ==="
