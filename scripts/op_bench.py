"""Micro-benchmarks of the solver's hot ops at the bench-config shapes.

Times each op as its own jitted program, hard-synced, several reps.
Decides where the Hv (CG body) time actually goes:

  project  : gather-FMA from a (D, k) table over m rows
  scatter  : segment_sum back into the (D, k) table
  pos_dot  : COO row-dot  <A[u], B[v]> over nnz entries
  pos_scat : COO scatter  sum_t w_t B[v_t] -> (m, k)
  variants : sorted/promise hints, bf16 storage

Usage: python scripts/op_bench.py   [OPB_* env]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, reps=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    # hard sync: host scalar fetch (relay-proof)
    _ = float(jax.numpy.ravel(out if not isinstance(out, tuple) else out[0])[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.numpy.ravel(out if not isinstance(out, tuple) else out[0])[0])
    return (time.perf_counter() - t0) / reps


def rec(results, key, val):
    results[key] = val
    print(json.dumps({key: round(val * 1e3, 3)}), flush=True)


def main() -> int:
    m = int(os.environ.get("OPB_M", 200_704))      # bench padded users
    n = int(os.environ.get("OPB_N", 20_224))       # bench padded items
    nnz = int(os.environ.get("OPB_NNZ", 1 << 20))  # ~1M positives
    k = int(os.environ.get("OPB_K", 32))

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    results = {}

    for dtype_name in ("float32", "bfloat16"):
        dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
        A = jnp.asarray(rng.normal(size=(m, k)), dt)        # phi / P cache
        B = jnp.asarray(rng.normal(size=(n, k)), dt)        # Q1 cache
        W = jnp.asarray(rng.normal(size=(m, k)), dt)        # id-field table
        u = jnp.asarray(np.sort(rng.integers(0, m, nnz)), jnp.int32)
        v = jnp.asarray(rng.integers(0, n, nnz), jnp.int32)
        w = jnp.ones(nnz, dt)
        idx = jnp.asarray(rng.integers(0, m, (m, 1)), jnp.int32)
        val = jnp.ones((m, 1), dt)

        sfx = "" if dtype_name == "float32" else "_bf16"

        # --- project/scatter over the (D=m, k) table, p=1 ---
        proj = jax.jit(lambda i, vl, T: vl[:, 0, None] * T[i[:, 0]])
        rec(results, f"project_m_from_m{sfx}", timed(proj, (idx, val, W)))

        scat = jax.jit(
            lambda i, vl, Z: jax.ops.segment_sum(
                vl[:, 0, None] * Z, i[:, 0], num_segments=m
            )
        )
        rec(results, f"scatter_m_to_m{sfx}", timed(scat, (idx, val, A)))

        # --- COO ops ---
        pd = jax.jit(lambda a, b: jnp.sum(a[u] * b[v], axis=1))
        rec(results, f"pos_dot{sfx}", timed(pd, (A, B)))

        # A-side only (sorted gather) / B-side only (random gather)
        ga = jax.jit(lambda a: jnp.sum(a[u], axis=1))
        rec(results, f"gather_sortedA{sfx}", timed(ga, (A,)))
        gb = jax.jit(lambda b: jnp.sum(b[v], axis=1))
        rec(results, f"gather_randomB{sfx}", timed(gb, (B,)))

        ps_u = jax.jit(
            lambda ww, b: jax.ops.segment_sum(
                ww[:, None] * b[v], u, num_segments=m, indices_are_sorted=True
            )
        )
        rec(results, f"pos_scatter_to_m_sorted{sfx}", timed(ps_u, (w, B)))

        ps_v = jax.jit(
            lambda ww, a: jax.ops.segment_sum(
                ww[:, None] * a[u], v, num_segments=n
            )
        )
        rec(results, f"pos_scatter_to_n{sfx}", timed(ps_v, (w, A)))

        if dtype_name == "float32":
            # full hv_cross-shaped composite (what one CG iter pays per table)
            QTQ = B.T @ B

            def hv(Vt):
                phi = Vt  # identity projection
                dense = 0.1 * (phi @ QTQ)
                pq = jnp.sum(phi[u] * B[v], axis=1) * w
                zp = jax.ops.segment_sum(
                    0.9 * pq[:, None] * B[v], u, num_segments=m,
                    indices_are_sorted=True,
                )
                return 0.05 * Vt + dense + zp

            rec(results, "hv_cross_composite", timed(jax.jit(hv), (A,)))

    print(json.dumps({kk: round(vv * 1e3, 3) for kk, vv in results.items()},
                     indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
