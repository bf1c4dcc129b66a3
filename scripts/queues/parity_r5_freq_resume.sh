#!/bin/bash
# Resume the ffm-freq k16 sweep-parity cell (the last registry gap).
# The 2026-08-21 session ran seeds 0.. under a 58-min cap with heavy CPU
# contention (TPU benches + 3-way ours oversubscription); completed pairs
# streamed to docs/parity_logs/parity_k16_ffm_freq_f32.log and completed
# reference runs are cached in /root/ref_cache (keyed by dataset+hp hash,
# datasets regenerate deterministically per seed).  Run this with an idle
# host to finish the N=10 matrix; then merge with parity_summarize.py.
set -u
cd "$(dirname "$0")/../.."
OFFSET=${1:?usage: parity_r5_freq_resume.sh <seed-offset> [n-seeds]}
N=${2:-$((10 - OFFSET))}
timeout 21600 python scripts/parity_check.py --tier sweep \
  --seeds "$N" --seed-offset "$OFFSET" --jobs 2 --variants ffm-freq \
  --grid "16:4:0.00048828125" --ref-cache /root/ref_cache \
  >> docs/parity_logs/parity_k16_ffm_freq_f32.log 2>&1
echo "rc=$?"
python scripts/parity_summarize.py docs/parity_logs/parity_k16_ffm_freq_f32.log
