#!/bin/bash
# Round-5 sweep-tier parity matrix (VERDICT r4 #1), CPU track.
# Ordered by judge priority: the never-run KKBox-like cells first
# (k=32 λ=1 ω=2^-5 and k=64 λ=4 ω=2^-5, reference-best variant
# ffm-ffm--ns — ref rows logs/kkbox.64.te/ffm-ffm--ns/...), then the
# remaining k16 variants cheapest-first so a timeout still lands whole
# variants.  All runs stream per-pair lines (salvageable via
# parity_summarize.py) and share the reference cache so the bf16 TPU
# track re-runs nothing.
# k16 ffm-ffm and ffm-ffm--ns already landed N=10 (docs/parity_logs/).
set -u
cd "$(dirname "$0")/../.."
CACHE=/root/ref_cache
LOGS=docs/parity_logs
mkdir -p "$LOGS"

echo "=== B: k32 lam=1 omega=2^-5, ffm-ffm--ns, N=10 f32 ==="
timeout 21600 python scripts/parity_check.py --tier sweep --seeds 10 \
  --jobs 2 --variants ffm-ffm--ns --grid "32:1:0.03125" \
  --ref-cache "$CACHE" > "$LOGS/parity_k32_ns_f32.log" 2>&1
echo "B rc=$?"

echo "=== C: k64 lam=4 omega=2^-5, ffm-ffm--ns, N=10 f32 ==="
timeout 43200 python scripts/parity_check.py --tier sweep --seeds 10 \
  --jobs 2 --variants ffm-ffm--ns --grid "64:4:0.03125" \
  --ref-cache "$CACHE" > "$LOGS/parity_k64_ns_f32.log" 2>&1
echo "C rc=$?"

echo "=== A: k16 remaining variants (cheapest first), N=10 f32 ==="
for v in mf-mf--ns fm-fm--ns fm-fm ffm-freq; do
  echo "--- $v ---"
  timeout 21600 python scripts/parity_check.py --tier sweep --seeds 10 \
    --jobs 2 --variants "$v" --grid "16:4:0.00048828125" \
    --ref-cache "$CACHE" > "$LOGS/parity_k16_${v//-/_}_f32.log" 2>&1
  echo "A($v) rc=$?"
done
echo "=== parity_r5 queue done ==="
