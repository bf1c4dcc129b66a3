"""Micro-bench: blocked-sorted positive ops vs the plain COO pair, on-chip.

Times (hard-synced, reps-amortized):
  pair        pos_dot + pos_scatter        (per-CG-iteration cost today)
  hv_blk      pos_hv_blocked               (fused blocked replacement)
  scat        pos_scatter alone            (per-gradient cost today)
  scat_blk    pos_scatter_blocked          (blocked replacement)
  hv_blk2     variant: ONE big up-front row gather, matmuls over slices
              (is the per-block gather loop latency-bound?)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from one_class_ffm_tpu.ops.sparse_ops import (
    make_blocked_layout,
    pos_dot,
    pos_hv_blocked,
    pos_scatter,
    pos_scatter_blocked,
)


def sync(x):
    return float(jnp.sum(x.ravel()[:1]))


def timeit(fn, *args, reps=8):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / reps


def main():
    num = int(os.environ.get("GM_NUM", 200_704))
    n_other = int(os.environ.get("GM_OTHER", 20_224))
    nnz = int(os.environ.get("GM_NNZ", 1_000_000))
    k = int(os.environ.get("GM_K", 32))
    BM = int(os.environ.get("GM_BM", 256))
    dtype = (jnp.bfloat16 if os.environ.get("GM_DTYPE", "f32") == "bf16"
             else jnp.float32)

    rng = np.random.default_rng(0)
    own_np = np.sort(rng.integers(0, num, nnz)).astype(np.int32)
    oth_np = rng.integers(0, n_other, nnz).astype(np.int32)
    blk = make_blocked_layout(own_np, oth_np, num, BM)
    assert blk is not None
    print(f"n_blocks={blk['src'].shape[0]} MAXC={blk['maxc']} "
          f"pad_ratio={blk['src'].size / nnz:.2f}", flush=True)

    own = jnp.asarray(own_np)
    other = jnp.asarray(oth_np)
    take = jnp.asarray(blk["take"])
    src = jnp.asarray(blk["src"])
    ownl = jnp.asarray(blk["own"])
    w = jnp.asarray(rng.random(nnz), dtype)
    B = jnp.asarray(rng.normal(size=(n_other, k)), dtype)
    phi = jnp.asarray(rng.normal(size=(num, k)), dtype)

    @jax.jit
    def pair(phi):
        pq = pos_dot(phi, own, B, other) * w
        return pos_scatter(pq, B, other, own, num, seg_sorted=True)

    @jax.jit
    def hv_blk(phi):
        return pos_hv_blocked(phi, B, w, take, src, ownl, num, BM)

    @jax.jit
    def scat(w_):
        return pos_scatter(w_, B, other, own, num, seg_sorted=True)

    @jax.jit
    def scat_blk(w_):
        return pos_scatter_blocked(w_, B, take, src, ownl, num, BM)

    n_blocks, MAXC = blk["src"].shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (MAXC, BM), 1)
    acc = jnp.promote_types(dtype, jnp.float32)

    @jax.jit
    def hv_blk2(phi):
        rows_all = B[take.reshape(-1)].reshape(n_blocks, MAXC, k)
        wb = w[src]

        def body(i, out):
            rows = rows_all[i]
            ohm = (ownl[i][:, None] == iota).astype(dtype)
            phig = jax.lax.dot(ohm, jax.lax.dynamic_slice(
                phi, (i * BM, 0), (BM, k)),
                preferred_element_type=acc).astype(dtype)
            pq = jnp.sum(phig * rows, axis=1) * wb[i]
            bl = jax.lax.dot(ohm.T, pq[:, None] * rows,
                             preferred_element_type=acc).astype(dtype)
            return jax.lax.dynamic_update_slice(out, bl, (i * BM, 0))

        return jax.lax.fori_loop(0, n_blocks, body,
                                 jnp.zeros((num, k), dtype))

    @jax.jit
    def hv_blk3(phi):
        # bf16 variant: gather from an f32 UPCAST of B — single-row gathers
        # from bf16 arrays pay sub-sublane penalties (bf16 rows share
        # sublane pairs); the once-per-solve upcast is one linear pass
        B32 = B.astype(jnp.float32)
        rows_all = B32[take.reshape(-1)].reshape(n_blocks, MAXC, k)
        wb = w[src].astype(jnp.float32)
        phi32 = phi.astype(jnp.float32)

        def body(i, out):
            rows = rows_all[i]
            ohm = (ownl[i][:, None] == iota).astype(jnp.float32)
            phig = jax.lax.dot(ohm, jax.lax.dynamic_slice(
                phi32, (i * BM, 0), (BM, k)),
                preferred_element_type=jnp.float32)
            pq = jnp.sum(phig * rows, axis=1) * wb[i]
            bl = jax.lax.dot(ohm.T, pq[:, None] * rows,
                             preferred_element_type=jnp.float32)
            return jax.lax.dynamic_update_slice(
                out, bl.astype(dtype), (i * BM, 0))

        return jax.lax.fori_loop(0, n_blocks, body,
                                 jnp.zeros((num, k), dtype))

    for name, fn, arg in [("pair", pair, phi), ("hv_blk", hv_blk, phi),
                          ("hv_blk2", hv_blk2, phi), ("hv_blk3", hv_blk3, phi),
                          ("scat", scat, w),
                          ("scat_blk", scat_blk, w)]:
        t = timeit(fn, arg)
        print(f"{name:9s}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
