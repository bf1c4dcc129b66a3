"""Metric-parity harness: C++ reference vs the TPU framework on the same data.

Builds the reference binary (scripts/build_reference.sh), generates a
synthetic dataset, runs both trainers with identical hyperparameters, parses
each one's final validation row, and checks the metrics agree within a
tolerance that reflects run-to-run variance (inits differ: unseeded libc
rand() vs jax PRNG — parity is statistical, SURVEY.md §7 hard parts).

Usage:
    python scripts/parity_check.py [--users 2000] [--items 200] [--k 8]
        [--epochs 20] [--omega 0.1] [--lam 0.05] [--rtol 0.35]

Exit 0 on parity, 1 on divergence.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def build_reference() -> str:
    binary = os.path.join(HERE, "ref_build", "train")
    if not os.path.exists(binary):
        subprocess.run([os.path.join(HERE, "build_reference.sh")], check=True)
    return binary


def last_metric_row(text: str):
    from one_class_ffm_tpu.logtools import parse_row

    row = None
    for ln in text.splitlines():
        r = parse_row(ln.strip())
        if r is not None and r.p:
            row = r
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--items", type=int, default=150)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--omega", type=float, default=0.1)
    ap.add_argument("--lam", type=float, default=0.05)
    ap.add_argument("--rtol", type=float, default=0.35,
                    help="relative tolerance on ranking metrics")
    ap.add_argument("--ns", action="store_true")
    args = ap.parse_args()

    from one_class_ffm_tpu.data.synth import SynthSpec, write_dataset

    binary = build_reference()
    workdir = tempfile.mkdtemp(prefix="parity_")
    spec = SynthSpec(
        n_users=args.users, n_items=args.items, avg_pos=6.0, seed=42
    )
    item, train, va = write_dataset(workdir, spec)

    ref_cmd = [binary, "-k", str(args.k), "-l", str(args.lam),
               "-w", str(args.omega), "-r", "-1", "-t", str(args.epochs),
               "-c", "4", "-p", va]
    if args.ns:
        ref_cmd.append("--ns")
    ref_cmd += [item, train]
    print("reference:", " ".join(ref_cmd))
    ref = subprocess.run(ref_cmd, capture_output=True, text=True)
    if ref.returncode != 0:
        print("reference FAILED:", ref.stderr[-800:])
        return 1
    ref_out = ref.stdout

    our_cmd = [sys.executable, "-m", "one_class_ffm_tpu", item, train,
               "-p", va, "-k", str(args.k), "-l", str(args.lam),
               "-w", str(args.omega), "-r", "-1", "-t", str(args.epochs),
               "--eval-every", "10"]
    if args.ns:
        our_cmd.append("--ns")
    print("ours:", " ".join(our_cmd))
    ours = subprocess.run(our_cmd, capture_output=True, text=True)
    if ours.returncode != 0:
        print("ours FAILED:", ours.stderr[-800:])
        return 1
    our_out = ours.stdout

    ref_row = last_metric_row(ref_out)
    our_row = last_metric_row(our_out)
    if ref_row is None or our_row is None:
        print("FAIL: missing metric rows", ref_out[-500:], our_out[-500:])
        return 1

    print(f"{'metric':>10} {'reference':>12} {'ours':>12} {'rel diff':>10}")
    ok = True
    for K in (5, 10, 20, 40, 80):
        r, o = ref_row.p.get(K), our_row.p.get(K)
        if r is None or o is None:
            continue
        rel = abs(o - r) / max(abs(r), 1e-9)
        flag = "" if rel <= args.rtol or abs(o - r) < 0.5 else "  <-- DIVERGED"
        if flag:
            ok = False
        print(f"{'p@' + str(K):>10} {r:12.4g} {o:12.4g} {rel:10.2%}{flag}")
        rn, on = ref_row.ndcg.get(K), our_row.ndcg.get(K)
        if rn is not None and on is not None:
            rel = abs(on - rn) / max(abs(rn), 1e-9)
            flag = "" if rel <= args.rtol or abs(on - rn) < 0.5 else "  <-- DIVERGED"
            if flag:
                ok = False
            print(f"{'ndcg@' + str(K):>10} {rn:12.4g} {on:12.4g} {rel:10.2%}{flag}")
    if ref_row.ploss is not None and our_row.ploss is not None:
        rel = abs(our_row.ploss - ref_row.ploss) / max(ref_row.ploss, 1e-9)
        flag = "" if rel <= args.rtol else "  <-- DIVERGED"
        if flag:
            ok = False
        print(f"{'ploss':>10} {ref_row.ploss:12.4g} {our_row.ploss:12.4g} {rel:10.2%}{flag}")

    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
