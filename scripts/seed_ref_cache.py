"""Seed a parity_check.py --ref-cache directory from existing parity logs.

A parity log's ``ref={...}`` lines are exact reference-run results keyed by
(cell, variant, seed); the datasets they ran on are regenerated
deterministically from the seed.  Re-deriving the cache entries lets a new
tier (e.g. --our-dtype bfloat16) skip every reference re-run even when the
original run predates --ref-cache.

Usage:
    python scripts/seed_ref_cache.py CACHE_DIR LOG [LOG...]
        [--users 50000] [--items 5000] [--skew 1.0] [--epochs 100]

The sizes/skew/epochs must match the original run (sweep-tier defaults).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from parity_check import _ref_cache_path, gen_variant  # noqa: E402

LINE = re.compile(r"^\[k=(?P<k>\d+) λ=(?P<lam>\S+) ω=(?P<om>\S+) "
                  r"(?P<var>\S+) seed (?P<seed>\d+)\] ref=(?P<js>\{.*\})"
                  r"(?:\s+\(\d+s\))?$")


def _canon(x: float) -> float:
    """Snap a %g-printed hyperparameter back to its canonical grid value —
    the cache key hashes repr(omega), and the log prints 2^-11 as
    0.000488281 (6 significant digits)."""
    for j in range(0, 16):
        c = 2.0 ** -j
        if abs(x - c) <= 1e-4 * c:
            return c
    if abs(x - round(x)) <= 1e-9:
        return float(round(x))
    return x


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cache_dir")
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--users", type=int, default=50_000)
    ap.add_argument("--items", type=int, default=5000)
    ap.add_argument("--skew", type=float, default=1.0)
    ap.add_argument("--epochs", type=int, default=100)
    args = ap.parse_args()
    os.makedirs(args.cache_dir, exist_ok=True)

    entries = {}
    for path in args.logs:
        for ln in open(path):
            m = LINE.match(ln.strip())
            if m:
                key = (int(m["k"]), _canon(float(m["lam"])),
                       _canon(float(m["om"])), m["var"], int(m["seed"]))
                entries[key] = json.loads(m["js"].replace("NaN", "null"))
    n = 0
    for (k, lam, om, variant, seed), rm in sorted(entries.items()):
        workdir = tempfile.mkdtemp(prefix=f"seedcache_{variant}_{seed}_")
        item, train, va, flags = gen_variant(
            workdir, variant, args.users, args.items, seed=1000 + seed,
            skew=args.skew)
        cache_file = _ref_cache_path(args.cache_dir, (item, train, va),
                                     flags, args.epochs, k, lam, om)
        with open(cache_file, "w") as fh:
            json.dump(rm, fh)
        n += 1
        print(f"seeded {variant} seed {seed} k={k} -> "
              f"{os.path.basename(cache_file)}", flush=True)
    print(f"{n} cache entries written to {args.cache_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
