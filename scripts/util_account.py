"""Honest utilization accounting: bytes moved and FLOPs per epoch vs the
chip's peaks, from the actual layout shapes (VERDICT r3 #6).

Builds the bench config's host-side layout (no device work unless
``--iters auto``), applies an explicit per-pass cost model of the shipped
kernel stack, and prints achieved HBM bandwidth / MXU throughput for a
measured examples/s.  The model is deliberately simple and its assumptions
are printed; it exists to replace vibes ("near the roofline") with
arithmetic.

Cost model (shipped stack: kt + fused-table + pregather + slot carry):

  per cross-block HALF solve on segment side s with S slot entries
  (n_blocks x MAXC tail + chunked head), table dim D, rank k, itemsize B:
    pregather     read ~S*k*B (random, tile-granular: undercounts real
                  cost) + write S*k*B
    gradient      read S*k*B stream + S*B coefficients + write D*k
    CG iteration  read S*k*B stream + S*B weights (+ identity sides:
                  read/write (rows, k) phi/zp) ; omega term 2*rows*k^2
    CG vectors    ~6 reads/writes of (D, k) f32 per iteration (S/R/V/Hv
                  recurrence at the f32 floor)
    gap           read S*k*B + write S*B
    carry         ~4 elementwise passes over both sides' S*B slots

  self blocks: gradient seg-sum S*B + fused table pass over (rows, k);
  per CG iteration read Q1 (rows, k) + table vectors.

  Useful FLOPs per stream entry per positive pass: 4k (pq dot + scaled
  accumulate).  EXECUTED MXU FLOPs are much larger: the one-hot
  gather/scatter-by-matmul burns 2*BM*k per slot per matmul by design
  (that is the trade: MXU FLOPs are cheaper than random HBM access).

Usage:
  python scripts/util_account.py --eps 598000 [--iters 8] [--users ...]
  python scripts/util_account.py --eps 407000 --users 1000000 \
      --items 500000 [--skew 1.0]
"""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

HBM_PEAK_GBS = 819.0   # v5e HBM2 bandwidth
MXU_PEAK_TFLOPS = 197.0  # v5e bf16
MXU_PEAK_TFLOPS_F32 = 49.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--items", type=int, default=20_000)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--skew", type=float, default=0.0)
    ap.add_argument("--eps", type=float, required=True,
                    help="measured examples/s (users per second) to account")
    ap.add_argument("--iters", default="10",
                    help="mean CG iterations per half-solve (epochs 2..5); "
                         "'auto' measures it on CPU via epoch_stats")
    ap.add_argument("--dtype-bytes", type=int, default=2,
                    help="storage itemsize (bf16=2)")
    args = ap.parse_args()

    import numpy as np

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.ops.sparse_ops import make_blocked_layout

    spec = SynthSpec(n_users=args.users, n_items=args.items, fu=2, fv=2,
                     dims_u=(args.users, 1000), dims_v=(args.items, 500),
                     avg_pos=5.0, seed=0, pop_skew=args.skew)
    (du, dv), u_pad, v_pad, y_pad = build_padded(
        spec, dtype=np.float32, row_multiple=256)
    layout = BlockLayout.make(du, dv, self_side=True)
    pads = np.asarray(y_pad.w) == 0
    BM = 256
    blk_u = make_blocked_layout(y_pad.u, y_pad.v, u_pad.m, BM, drop=pads)
    blk_v = make_blocked_layout(y_pad.v, y_pad.u, v_pad.m, BM, drop=pads)

    def slot_count(b):
        if b is None:
            return None
        s = b["own"].size
        if "hd_src" in b:
            s += b["hd_src"].size
        return s

    S_u, S_v = slot_count(blk_u), slot_count(blk_v)
    if S_u is None or S_v is None:
        print("layout rejected on a side — model covers the kernel stack "
              "only; rerun with a config both sides accept")
        return 1
    k, B = args.k, args.dtype_bytes
    nnz = int((~pads).sum())
    m, n = u_pad.m, v_pad.m

    if args.iters == "auto":
        import jax
        import jax.numpy as jnp

        from one_class_ffm_tpu.solver.jax_solver import (FFMSolver,
                                                         make_device_data)
        from one_class_ffm_tpu.solver.params import HyperParams

        hp = HyperParams(k=k, lam=0.05, omega=0.1, r=-1.0)
        meta, data = make_device_data(u_pad, v_pad, y_pad, layout, hp,
                                      dtype=jnp.bfloat16, blocked_bm=BM)
        solver = FFMSolver(meta, data)
        st = solver.init(jax.random.key(0))
        its = []
        for _ in range(5):
            st, it = solver.epoch_stats(st)
            its.append(np.asarray(it))
        iters = float(np.mean(its[1:]))  # epochs 2..5, the bench window
        print(f"# measured mean CG iters/half-solve (CPU bf16): {iters:.2f}")
    else:
        iters = float(args.iters)

    cross = layout.cross_blocks()
    self_u = layout.user_self_blocks()
    self_v = layout.item_self_blocks()

    def pad_d(d):
        return d

    bytes_total = 0.0
    flops_useful = 0.0
    flops_mxu = 0.0
    for bi in cross:
        for first in (True, False):
            S = S_u if first else S_v
            rows = m if first else n
            D = pad_d(bi.d1 if first else bi.d2)
            ident = D >= rows  # the id fields; others are fused-table
            stream = S * k * B
            # pregather (read random + write) + grad + iters*hv + gap
            passes = 2 + 1 + iters + 1
            bytes_total += passes * stream
            bytes_total += (3 + iters) * S * B  # coeffs/weights/gap/carry
            if ident:
                # phi/zp (rows, k) round trips per pass + CG vectors (D~rows)
                bytes_total += (iters + 2) * 2 * rows * k * B
                bytes_total += iters * 6 * D * k * 4
            else:
                bytes_total += iters * 6 * D * k * 4
            # useful FLOPs: 4k per entry per positive pass; omega term
            flops_useful += (1 + iters + 1) * S * 4 * k
            flops_useful += iters * 2 * rows * k * k  # phi @ (w QTQ)
            # executed MXU: one-hot matmuls burn 2*BM*k per slot per matmul
            # (two per pass: gather-by-matmul + segment-sum-by-matmul)
            flops_mxu += (1 + iters + 1) * S * 2 * 2 * BM * k
            flops_mxu += iters * 2 * rows * k * k
    for bi in self_u + self_v:
        rows = m if bi.kind == "uu" else n
        S = S_u if bi.kind == "uu" else S_v
        for first in (True, False):
            D = pad_d(bi.d1 if first else bi.d2)
            bytes_total += S * B  # grad seg-sum of the carry coefficients
            bytes_total += (iters + 1) * 2 * rows * k * B  # Q1 + out
            bytes_total += iters * 6 * D * k * 4
            flops_useful += iters * rows * 3 * k
    # carry propagation per cross half-solve: both sides' slots touched
    bytes_total += len(cross) * 2 * 4 * (S_u + S_v) * B
    # epoch cache refresh (sa/sb, grams): rows*k reads per cross block
    bytes_total += len(cross) * (m + n) * k * B

    ep_t = args.users / args.eps
    gbs = bytes_total / ep_t / 1e9
    tf_useful = flops_useful / ep_t / 1e12
    tf_mxu = flops_mxu / ep_t / 1e12
    print(f"config: {args.users}x{args.items} k={k} nnz={nnz} "
          f"slots u={S_u} v={S_v} iters={iters:g} eps={args.eps:g}")
    print(f"epoch time            : {ep_t * 1e3:8.1f} ms")
    print(f"bytes/epoch (model)   : {bytes_total / 1e9:8.2f} GB")
    print(f"achieved HBM bandwidth: {gbs:8.1f} GB/s  "
          f"({100 * gbs / HBM_PEAK_GBS:.1f}% of {HBM_PEAK_GBS:.0f} GB/s)")
    print(f"useful FLOPs/epoch    : {flops_useful / 1e12:8.3f} TFLOP -> "
          f"{tf_useful:6.2f} TFLOP/s ({100 * tf_useful / MXU_PEAK_TFLOPS:.2f}% "
          f"of bf16 peak)")
    print(f"executed MXU FLOPs    : {flops_mxu / 1e12:8.3f} TFLOP -> "
          f"{tf_mxu:6.2f} TFLOP/s ({100 * tf_mxu / MXU_PEAK_TFLOPS:.1f}% "
          f"of bf16 peak)")
    print("# one-hot gather/scatter-by-matmul burns MXU FLOPs to avoid "
          "random HBM access — executed >> useful by design")
    return 0


if __name__ == "__main__":
    sys.exit(main())
