"""Aggregate per-seed lines from a parity_check.py log into the same
parity table the script prints at the end — for salvaging long background
runs that were stopped mid-cell (each paired trial prints as it lands).

Usage: python scripts/parity_summarize.py LOG [LOG...]
       [--rtol 0.15] [--floor 0.0] [--sign-rtol 0.05]
"""

from __future__ import annotations

import argparse
import json
import math
import re
import sys

LINE = re.compile(r"^\[(?P<cell>k=\S+ λ=\S+ ω=\S+) (?P<var>\S+) seed "
                  r"(?P<seed>\d+)\] (?P<who>ref|our)=(?P<js>\{.*\})"
                  r"(?:\s+\(\d+s\))?$")
METRICS = ["p@5", "p@10", "p@20", "ndcg@10", "ndcg@20", "ploss"]


def mean_std(xs):
    n = len(xs)
    mu = sum(xs) / n
    var = sum((x - mu) ** 2 for x in xs) / max(n - 1, 1)
    return mu, math.sqrt(var)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--rtol", type=float, default=0.15)
    ap.add_argument("--floor", type=float, default=0.0)
    ap.add_argument("--sign-rtol", type=float, default=0.05)
    args = ap.parse_args()

    pairs = {}  # (cell, var, seed) -> {"ref": {...}, "our": {...}}
    for path in args.logs:
        for ln in open(path):
            m = LINE.match(ln.strip())
            if m:
                key = (m["cell"], m["var"], int(m["seed"]))
                pairs.setdefault(key, {})[m["who"]] = json.loads(
                    m["js"].replace("NaN", "null"))
    cells = {}
    for (cell, var, seed), d in sorted(pairs.items()):
        if "ref" in d and "our" in d:
            cells.setdefault((cell, var), []).append((d["ref"], d["our"]))

    all_ok = True
    print("| cell | variant | metric | reference mean±σ | ours mean±σ | "
          "Δmean | tol | sign | verdict |")
    print("|---|---|---|---|---|---|---|---|---|")
    for (cell, var), rows in cells.items():
        for m in METRICS:
            rv = [r[m] for r, o in rows
                  if r.get(m) is not None and o.get(m) is not None]
            ov = [o[m] for r, o in rows
                  if r.get(m) is not None and o.get(m) is not None]
            if not rv:
                continue
            mu_r, sd_r = mean_std(rv)
            mu_o, sd_o = mean_std(ov)
            diffs = [o_ - r_ for r_, o_ in zip(rv, ov)]
            _, sd_d = mean_std(diffs)
            dm = abs(mu_o - mu_r)
            tol = max(2.0 * sd_d / math.sqrt(len(diffs)),
                      args.rtol * abs(mu_r), args.floor)
            n_pos = sum(1 for x in diffs if x > 0)
            n_neg = sum(1 for x in diffs if x < 0)
            one_sided = (n_pos == 0 or n_neg == 0) and len(diffs) >= 5
            signed_bad = one_sided and dm > args.sign_rtol * abs(mu_r)
            ok = dm <= tol and not signed_bad
            all_ok &= ok
            verdict = ("ok" if ok else
                       "ONE-SIDED" if signed_bad and dm <= tol
                       else "DIVERGED")
            print(f"| {cell} | {var} (N={len(diffs)}) | {m} | "
                  f"{mu_r:.3g} ± {sd_r:.2g} | {mu_o:.3g} ± {sd_o:.2g} | "
                  f"{dm:.2g} | {tol:.2g} | +{n_pos}/-{n_neg} | {verdict} |")
    print("ALL PARITY OK" if all_ok else "PARITY FAILED")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
