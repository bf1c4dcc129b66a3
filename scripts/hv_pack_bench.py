"""Lane-packing experiment for the per-CG-iteration hv pass (VERDICT r3 #4).

The kt kernel's matmuls are M=k=32 tall on a 128x128 MXU (25% of the
array's rows).  The PACKED layout stores 4 stream entries per 128-lane row
— (MAXC/4, 128), entry e = j*MAXC/4 + c at [c, 32j:32j+32] — so every
matmul's M dim becomes MAXC/4 (>=128 at bench shapes) or BM:

    phig groups   4x (M4, BM) @ (BM, k)      [vs 1x (k, BM) @ (BM, MAXC)]
    pq fold       (M4, 128) @ S(128, 4)      lane-group segment sums
    pq broadcast  (M4, 4) @ S^T(4, 128)
    zp            4x (M4, BM)^T-contract (M4, k) -> (BM, k)
    dense         (BM, k) @ (k, k)

Same total FLOPs (the one-hot work dominates either way), same stream
bytes, radically better matmul geometry — IF the extra matmul count and
the packed relayout don't eat the win.  This script measures, on the real
chip at headline shapes:

    kt      the shipped pos_hv_kt_pallas (k-major)
    kt_gN   the same kernel G-batched (several blocks per grid step)
    packed  the lane-packed kernel above
    (+ the one-time packed pregather/relayout cost per solve)

and checks all against the XLA blocked reference first.  Run on CPU
(JAX_PLATFORMS=cpu) for a correctness-only pass in interpret mode.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _packed_hv_kernel(w_scale: float, rows_ref, own_ref, w_ref, phi_ref,
                      dense_ref, out_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    dt = rows_ref.dtype
    acc = jnp.promote_types(dt, jnp.float32)
    rows_p = rows_ref[0]                       # (M4, 128)
    M4 = rows_p.shape[0]
    phib = phi_ref[...]                        # (BM, k)
    BM, k = phib.shape
    prec = (jax.lax.Precision.HIGHEST
            if dt in (jnp.float32, jnp.float64) else None)

    def dot(a, b):
        return jax.lax.dot(a, b, precision=prec, preferred_element_type=acc)

    iota_bm = jax.lax.broadcasted_iota(jnp.int32, (M4, BM), 1)
    ohs = []
    phig_groups = []
    for j in range(4):
        ownj = own_ref[0][:, 32 * j:32 * j + 1]          # (M4, 1) int
        ohj = (ownj == iota_bm).astype(dt)               # (M4, BM)
        ohs.append(ohj)
        phig_groups.append(dot(ohj, phib).astype(dt))    # (M4, k)
    phig_p = jnp.concatenate(phig_groups, axis=1)        # (M4, 128)
    prod = (phig_p * rows_p).astype(acc)                 # (M4, 128)
    li = jax.lax.broadcasted_iota(jnp.int32, (128, 4), 0) // 32
    lj = jax.lax.broadcasted_iota(jnp.int32, (128, 4), 1)
    S = (li == lj).astype(acc)                           # (128, 4)
    pq4 = dot(prod, S)                                   # (M4, 4)
    pqb = dot(pq4, S.T).astype(dt)                       # (M4, 128)
    Y = rows_p * (pqb * (w_ref[0] * jnp.asarray(w_scale, dt)))
    zp = dot(phib, dense_ref[...])                       # omega term
    for j in range(4):
        Yj = Y[:, 32 * j:32 * j + 32]                    # (M4, k)
        zp = zp + jax.lax.dot_general(
            ohs[j], Yj, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=acc)  # (BM, k)
    out_ref[...] = zp.astype(dt)


def pos_hv_packed_pallas(phi, rows_p, own_p, w_p, dense_mat, num_out,
                         block_rows, w_scale=1.0, interpret=False):
    from jax.experimental import pallas as pl

    n_blocks, M4, lanes = rows_p.shape
    assert lanes == 128
    dt = rows_p.dtype
    k = phi.shape[1]
    kern = functools.partial(_packed_hv_kernel, w_scale)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, M4, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, M4, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, M4, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0)),
            pl.BlockSpec((k, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_out, k), dt),
        interpret=interpret,
    )(rows_p, own_p, w_p, phi, dense_mat)


def pack_stream(B, take, own, w, w_scale_dummy=None):
    """(n_blocks, MAXC) -> packed (n_blocks, MAXC/4, 128) arrays.
    Entry e = j*M4 + c lands at [c, 32j:32j+32]."""
    nb, MAXC = take.shape
    assert MAXC % 4 == 0
    M4 = MAXC // 4
    k = B.shape[1]
    rows = B[take.reshape(-1)].reshape(nb, 4, M4, k)
    rows_p = jnp.transpose(rows, (0, 2, 1, 3)).reshape(nb, M4, 4 * k)

    def scal(x, dtype):
        xp = x.reshape(nb, 4, M4).transpose(0, 2, 1)[..., None]
        return jnp.broadcast_to(xp, (nb, M4, 4, 32)).reshape(
            nb, M4, 128).astype(dtype)

    return rows_p, scal(own, jnp.int32), scal(w, B.dtype)


def _gbatched_kt_kernel(G, block_rows, w_scale, rows_ref, own_ref, w_ref,
                        phi_ref, dense_ref, out_ref):
    from one_class_ffm_tpu.ops.sparse_ops import _dot_c1, _dotp, _ohm_t

    dt = rows_ref.dtype
    acc = jnp.promote_types(dt, jnp.float32)
    for j in range(G):
        rows_t = rows_ref[j]
        k, MAXC = rows_t.shape
        phib = phi_ref[j * block_rows:(j + 1) * block_rows, :]
        BM = phib.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (BM, MAXC), 0)
        ohm = (own_ref[j] == iota).astype(dt)
        phib_t = phib.T
        phig_t = _dotp(phib_t, ohm, acc).astype(dt)
        pq = jnp.sum((phig_t * rows_t).astype(acc), axis=0,
                     keepdims=True).astype(dt)
        Y = rows_t * (pq * (w_ref[j] * jnp.asarray(w_scale, dt)))
        zp_t = _dot_c1(Y, ohm, acc)
        zp_t = zp_t + _dotp(dense_ref[...], phib_t, acc, contract0=True)
        out_ref[j * block_rows:(j + 1) * block_rows, :] = zp_t.astype(dt).T


def pos_hv_kt_g_pallas(phi, rows_t, own, w_blk, dense_mat, num_out,
                       block_rows, G, w_scale=1.0, interpret=False):
    from jax.experimental import pallas as pl

    n_blocks, k, MAXC = rows_t.shape
    assert n_blocks % G == 0
    dt = rows_t.dtype
    kern = functools.partial(_gbatched_kt_kernel, G, block_rows, w_scale)
    return pl.pallas_call(
        kern,
        grid=(n_blocks // G,),
        in_specs=[
            pl.BlockSpec((G, k, MAXC), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, 1, MAXC), lambda i: (i, 0, 0)),
            pl.BlockSpec((G, 1, MAXC), lambda i: (i, 0, 0)),
            pl.BlockSpec((G * block_rows, k), lambda i: (i, 0)),
            pl.BlockSpec((k, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G * block_rows, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_out, k), dt),
        interpret=interpret,
    )(rows_t, own.reshape(n_blocks, 1, MAXC),
      w_blk.reshape(n_blocks, 1, MAXC), phi, dense_mat)


def timed(fn, args, reps=10):
    # args passed as jit ARGUMENTS — closed-over arrays become baked
    # constants and the relay rejects >100MB compile requests (HTTP 413)
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.ravel(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    return (time.perf_counter() - t0) / reps


def main() -> int:
    on_cpu = jax.default_backend() == "cpu"
    interp = on_cpu
    rng = np.random.default_rng(0)
    nb = int(os.environ.get("HVP_NB", 782))
    BM = 256
    MAXC = int(os.environ.get("HVP_MAXC", 1376))   # % 32 == 0
    k = 32
    B_rows = int(os.environ.get("HVP_BROWS", 20224))
    dt = jnp.bfloat16 if not on_cpu else jnp.float32
    num = nb * BM
    if on_cpu:
        nb, MAXC, B_rows = 8, 64, 512
        num = nb * BM

    own = rng.integers(0, BM + 1, size=(nb, MAXC)).astype(np.int32)
    own.sort(axis=1)
    w = (own < BM).astype(np.float32)
    take = rng.integers(0, B_rows, size=(nb, MAXC)).astype(np.int32)
    B = jnp.asarray(rng.normal(size=(B_rows, k)), dt)
    phi = jnp.asarray(rng.normal(size=(num, k)), dt)
    dmat = jnp.asarray(rng.normal(size=(k, k)) * 0.1, dt)
    own_j = jnp.asarray(own)
    w_j = jnp.asarray(w, dt)
    take_j = jnp.asarray(take)

    from one_class_ffm_tpu.ops.sparse_ops import (gather_blocked_rows,
                                                  gather_blocked_rows_t,
                                                  pos_hv_blocked,
                                                  pos_hv_kt_pallas)

    rows = gather_blocked_rows(B, take_j)
    rows_t = gather_blocked_rows_t(B, take_j)
    rows_p, own_p, w_p = jax.jit(pack_stream)(B, take_j, own_j, w_j)

    ref = pos_hv_blocked(phi, None, None, None, None, own_j, num, BM,
                         rows=rows, w_blk=w_j, w_scale=0.9, dense_mat=dmat)
    kt = pos_hv_kt_pallas(phi, rows_t, own_j, w_j, dmat, num, BM,
                          w_scale=0.9, interpret=interp)
    pk = pos_hv_packed_pallas(phi, rows_p, own_p, w_p, dmat, num, BM,
                              w_scale=0.9, interpret=interp)
    for name, got in (("kt", kt), ("packed", pk)):
        err = float(jnp.max(jnp.abs((got - ref)).astype(jnp.float32)))
        scale = float(jnp.max(jnp.abs(ref).astype(jnp.float32)))
        print(f"{name} rel={err / max(scale, 1e-9):.3e}")
    for G in (2, 1):
        if nb % G == 0:
            gt = pos_hv_kt_g_pallas(phi, rows_t, own_j, w_j, dmat, num, BM,
                                    G, w_scale=0.9, interpret=interp)
            err = float(jnp.max(jnp.abs((gt - ref)).astype(jnp.float32)))
            scale = float(jnp.max(jnp.abs(ref).astype(jnp.float32)))
            print(f"kt_g{G} rel={err / max(scale, 1e-9):.3e}")
    if on_cpu:
        print("CPU correctness pass done (no timing)")
        return 0

    res = {}
    res["kt_ms"] = timed(
        lambda p, r, o, w_, d: pos_hv_kt_pallas(p, r, o, w_, d, num, BM,
                                                w_scale=0.9),
        (phi, rows_t, own_j, w_j, dmat)) * 1e3
    res["packed_ms"] = timed(
        lambda p, r, o, w_, d: pos_hv_packed_pallas(p, r, o, w_, d, num,
                                                    BM, w_scale=0.9),
        (phi, rows_p, own_p, w_p, dmat)) * 1e3
    for G in (2, 4, 8):
        if nb % G == 0:
            res[f"kt_g{G}_ms"] = timed(
                functools.partial(
                    lambda G, p, r, o, w_, d: pos_hv_kt_g_pallas(
                        p, r, o, w_, d, num, BM, G, w_scale=0.9), G),
                (phi, rows_t, own_j, w_j, dmat)) * 1e3
    # one-time per-solve relayout costs
    res["pregather_t_ms"] = timed(gather_blocked_rows_t, (B, take_j)) * 1e3
    res["pack_ms"] = timed(lambda b, t, o, w_: pack_stream(b, t, o, w_)[0],
                           (B, take_j, own_j, w_j)) * 1e3
    print(json.dumps({kk: round(vv, 3) for kk, vv in res.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
