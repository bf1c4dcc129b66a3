"""Micro-bench the CG positive-pass options at bench shapes, hard-synced.

Times, per invocation, on the real chip:
  pair   : pos_dot + pos_scatter  (the per-CG-iteration COO pass)
  build  : pos_gram               (once-per-solve cache build)
  einsum : einsum('nk,nkl->nl') on reshaped (num,k,k) M
  unroll : flat-M unrolled slice matvec (what the solver ships)

Decision rule: gram wins when  build + iters*matvec < iters*pair.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from one_class_ffm_tpu.ops.sparse_ops import pos_dot, pos_gram, pos_scatter


def sync(x):
    # reduce on device, fetch 4 bytes — a full-array fetch of the 819MB gram
    # cache dies in the relay, and block_until_ready alone is unreliable here
    return float(jnp.sum(x.ravel()[:1]))


def timeit(fn, *args, reps=8):
    r = fn(*args)  # compile
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r)  # one RTT amortized over reps (relay-proof hard sync)
    return (time.perf_counter() - t0) / reps


def main():
    num = int(os.environ.get("GM_NUM", 200_000))
    n_other = int(os.environ.get("GM_OTHER", 20_000))
    nnz = int(os.environ.get("GM_NNZ", 1_000_000))
    k = int(os.environ.get("GM_K", 32))
    dtype = jnp.bfloat16 if os.environ.get("GM_DTYPE", "f32") == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    own = jnp.asarray(np.sort(rng.integers(0, num, nnz)), jnp.int32)
    other = jnp.asarray(rng.integers(0, n_other, nnz), jnp.int32)
    w = jnp.asarray(rng.random(nnz), dtype)
    Q1 = jnp.asarray(rng.normal(size=(n_other, k)), dtype)
    phi = jnp.asarray(rng.normal(size=(num, k)), dtype)

    @jax.jit
    def pair(phi):
        pq = pos_dot(phi, own, Q1, other) * w
        return pos_scatter(pq, Q1, other, own, num, seg_sorted=True)

    @jax.jit
    def build():
        return pos_gram(w, Q1, other, own, num, seg_sorted=True)

    M = build()
    M3 = M.reshape(num, k, k)

    @jax.jit
    def mv_einsum(phi):
        return jnp.einsum("nk,nkl->nl", phi, M3,
                          preferred_element_type=jnp.float32).astype(dtype)

    @jax.jit
    def mv_unroll(phi):
        zp = phi[:, 0, None] * jax.lax.slice_in_dim(M, 0, k, axis=1)
        for j in range(1, k):
            zp = zp + phi[:, j, None] * jax.lax.slice_in_dim(
                M, j * k, (j + 1) * k, axis=1)
        return zp

    print(f"shapes: num={num} other={n_other} nnz={nnz} k={k} "
          f"dtype={jnp.dtype(dtype).name}", flush=True)
    t_pair = timeit(pair, phi)
    print(f"pair   : {t_pair*1e3:8.2f} ms", flush=True)
    t_build = timeit(lambda: build())
    print(f"build  : {t_build*1e3:8.2f} ms", flush=True)
    if os.environ.get("GM_SKIP_EINSUM"):
        # the batched-dot lowering of the (n,k)x(n,k,k) einsum took >30 min
        # to compile on the v5e tunnel — measured unusable, skip by default
        t_einsum = float("nan")
    else:
        t_einsum = timeit(mv_einsum, phi)
    print(f"einsum : {t_einsum*1e3:8.2f} ms", flush=True)
    t_unroll = timeit(mv_unroll, phi)
    print(f"pair   : {t_pair*1e3:8.2f} ms / CG iter")
    print(f"build  : {t_build*1e3:8.2f} ms once")
    print(f"einsum : {t_einsum*1e3:8.2f} ms / CG iter")
    print(f"unroll : {t_unroll*1e3:8.2f} ms / CG iter")
    for name, t_mv in [("einsum", t_einsum), ("unroll", t_unroll)]:
        d = t_pair - t_mv
        be = t_build / d if d > 0 else float("inf")
        print(f"{name}: break-even at {be:.1f} CG iters")


if __name__ == "__main__":
    main()
