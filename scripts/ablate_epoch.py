"""Epoch op-ablation on the real chip: what does each hot op cost?

Fixes CG to exactly N iterations (cg_eps=0 -> always runs to the cap, so
every variant executes the identical op schedule), then monkeypatches
individual ops to return zeros and diffs epoch times.  The diff measures
the op plus everything XLA can dead-code-eliminate exclusively feeding it
(i.e. the op's true marginal cost).

Variants: baseline, no_pos_dot, no_pos_scatter, no_pos_both, no_tbl_scatter,
no_project.

Usage: python scripts/ablate_epoch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_users = int(os.environ.get("BENCH_USERS", 200_000))
    n_items = int(os.environ.get("BENCH_ITEMS", 20_000))
    k = int(os.environ.get("BENCH_K", 32))
    epochs = int(os.environ.get("BENCH_EPOCHS", 2))
    cap = int(os.environ.get("ABL_CAP", 5))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    variants = os.environ.get(
        "ABL_VARIANTS",
        "baseline,no_pos_dot,no_pos_scatter,no_pos_both,no_tbl_scatter,"
        "no_project,no_hv_blocked,no_scatter_blocked,no_pair,no_rows_pre",
    ).split(",")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.solver import jax_solver as JS
    from one_class_ffm_tpu.solver.params import HyperParams

    spec = SynthSpec(
        n_users=n_users, n_items=n_items, fu=2, fv=2,
        dims_u=(n_users, 1000), dims_v=(n_items, 500),
        avg_pos=5.0, seed=0,
    )
    (du, dv), u_pad, v_pad, y_pad = build_padded(
        spec, dtype=np.float32, row_multiple=256
    )
    layout = BlockLayout.make(du, dv, self_side=True)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    hp = HyperParams(k=k, lam=0.05, omega=0.1, r=-1.0,
                     cg_max_iter=cap, cg_eps=0.0)

    orig = dict(pos_dot=JS.pos_dot, pos_scatter=JS.pos_scatter,
                scatter=JS.scatter, project=JS.project,
                pos_hv_blocked=JS.pos_hv_blocked,
                pos_hv_blocked_pallas=JS.pos_hv_blocked_pallas,
                gather_blocked_rows=JS.gather_blocked_rows,
                pos_scatter_blocked=JS.pos_scatter_blocked,
                pos_scatter_pair=JS.pos_scatter_pair,
                pos_gap_blocked=JS.pos_gap_blocked,
                pos_hv_tbl_pallas=JS.pos_hv_tbl_pallas,
                hv_self_tbl_pallas=JS.hv_self_tbl_pallas,
                grad_cross_tbl_pallas=JS.grad_cross_tbl_pallas,
                grad_self_tbl_pallas=JS.grad_self_tbl_pallas,
                pos_hv_kt_pallas=JS.pos_hv_kt_pallas,
                pos_hv_tbl_kt_pallas=JS.pos_hv_tbl_kt_pallas,
                pos_scatter_kt_pallas=JS.pos_scatter_kt_pallas,
                pos_gap_kt_pallas=JS.pos_gap_kt_pallas,
                hv_self_tbl_kt_pallas=JS.hv_self_tbl_kt_pallas,
                grad_cross_tbl_kt_pallas=JS.grad_cross_tbl_kt_pallas,
                grad_self_tbl_kt_pallas=JS.grad_self_tbl_kt_pallas,
                gather_blocked_rows_t=JS.gather_blocked_rows_t)

    def patch(variant):
        for name, fn in orig.items():
            setattr(JS, name, fn)
        if variant == "no_hv_blocked":
            JS.pos_hv_blocked = (
                lambda phi, B, w, t, s_, o, num, bm, **kw:
                jnp.zeros((num, phi.shape[1]), phi.dtype))
            JS.pos_hv_blocked_pallas = (
                lambda phi, rows, o, w_blk, dm, num, bm, **kw:
                jnp.zeros((num, phi.shape[1]), phi.dtype))
        if variant == "no_rows_pre":
            # removes only the per-solve random row gather (the pregather);
            # the blocked passes still stream a (zeros) array of that shape
            JS.gather_blocked_rows = (
                lambda B, take: jnp.zeros(
                    (take.shape[0], take.shape[1], B.shape[1]), B.dtype))
        if variant == "no_scatter_blocked":
            def _zero_scatter(c, B, t, s_, o, num, bm, diag_w=None,
                              rows=None, diag_w_blk=None, **kw):
                k = rows.shape[2] if rows is not None else B.shape[1]
                dt = rows.dtype if rows is not None else B.dtype
                z = jnp.zeros((num, k), dt)
                if diag_w is None and diag_w_blk is None:
                    return z
                return z, z
            JS.pos_scatter_blocked = _zero_scatter
        if variant == "no_gap":
            JS.pos_gap_blocked = (
                lambda dT, rows, own, inv, bm, **kw:
                jnp.zeros(own.shape[0] * own.shape[1] if inv is None
                          else inv.shape[0], rows.dtype))
        if variant == "no_pair":
            JS.pos_scatter_pair = lambda a, b, B, t, s_, num, **kw: (
                jnp.zeros((num, B.shape[1]), B.dtype),
                jnp.zeros((num, B.shape[1]), B.dtype))
        if variant in ("no_pos_dot", "no_pos_both"):
            JS.pos_dot = lambda A, u, B, v, **kw: jnp.zeros(
                u.shape[0], A.dtype)
        if variant in ("no_pos_scatter", "no_pos_both"):
            JS.pos_scatter = lambda w, B, t, s, num, **kw: jnp.zeros(
                (num, B.shape[1]), B.dtype)
        if variant == "no_tbl_scatter":
            JS.scatter = lambda i, v, Z, d: jnp.zeros((d, Z.shape[1]), Z.dtype)
        if variant == "no_hv_kt":
            # the k-major per-CG-iteration passes (plain + fused table)
            JS.pos_hv_kt_pallas = (
                lambda phi, rows_t, own, w_blk, dm, num, bm, **kw:
                jnp.zeros((num, phi.shape[1]), phi.dtype))
            JS.pos_hv_tbl_kt_pallas = (
                lambda V, xi, xv, rows_t, own, w_blk, dm, bm, **kw:
                jnp.zeros(V.shape,
                          jnp.promote_types(V.dtype, jnp.float32)))
            JS.hv_self_tbl_kt_pallas = (
                lambda V, xi, xv, Q1, dd, bm, **kw:
                jnp.zeros(V.shape,
                          jnp.promote_types(V.dtype, jnp.float32)))
        if variant == "no_grad_kt":
            def _zero_gck(dd_, xi, xv, rows_t, own, cb, dense, bm,
                          w_blk=None, **kw):
                z = jnp.zeros((dd_, rows_t.shape[1]),
                              jnp.promote_types(rows_t.dtype, jnp.float32))
                return z if w_blk is None else (z, z)

            def _zero_gsk(dd_, xi, xv, Q1, zd, own, cb, bm, dd_row=None,
                          **kw):
                z = jnp.zeros((dd_, Q1.shape[1]),
                              jnp.promote_types(Q1.dtype, jnp.float32))
                return z if dd_row is None else (z, z)

            def _zero_sck(cb, rows_t, own, num, bm, w_blk=None, **kw):
                z = jnp.zeros((num, rows_t.shape[1]), rows_t.dtype)
                return z if w_blk is None else (z, z)

            JS.grad_cross_tbl_kt_pallas = _zero_gck
            JS.grad_self_tbl_kt_pallas = _zero_gsk
            JS.pos_scatter_kt_pallas = _zero_sck
        if variant == "no_gap_kt":
            JS.pos_gap_kt_pallas = (
                lambda dT, rows_t, own, bm, **kw:
                jnp.zeros(own.shape[0] * own.shape[1], rows_t.dtype))
        if variant == "no_rows_pre_kt":
            JS.gather_blocked_rows_t = (
                lambda B, take: jnp.zeros(
                    (take.shape[0], B.shape[1], take.shape[1]), B.dtype))
        if variant == "no_hv_tbl":
            # the fused table-space CG pass (cross + self)
            JS.pos_hv_tbl_pallas = (
                lambda V, xi, xv, rows, own, w_blk, dm, bm, **kw:
                jnp.zeros(V.shape, jnp.promote_types(V.dtype, jnp.float32)))
            JS.hv_self_tbl_pallas = (
                lambda V, xi, xv, Q1, dd, bm, **kw:
                jnp.zeros(V.shape, jnp.promote_types(V.dtype, jnp.float32)))
        if variant == "no_grad_tbl":
            # the fused table-space gradient (+ diag) passes
            def _zero_gc(dd_, xi, xv, rows, own, cb, dense, bm,
                         w_blk=None, **kw):
                z = jnp.zeros((dd_, rows.shape[2]),
                              jnp.promote_types(rows.dtype, jnp.float32))
                return z if w_blk is None else (z, z)

            def _zero_gs(dd_, xi, xv, Q1, zd, own, cb, bm, dd=None, **kw):
                z = jnp.zeros((dd_, Q1.shape[1]),
                              jnp.promote_types(Q1.dtype, jnp.float32))
                return z if dd is None else (z, z)

            JS.grad_cross_tbl_pallas = _zero_gc
            JS.grad_self_tbl_pallas = _zero_gs
        if variant == "no_project":
            JS.project = lambda i, v, T: jnp.zeros(
                (i.shape[0], T.shape[1]), T.dtype)

    for variant in variants:
        patch(variant.strip())
        meta, data = JS.make_device_data(
            u_pad, v_pad, y_pad, layout, hp, dtype=dtype,
            blocked_bm=int(os.environ.get("BENCH_BLOCKED_BM", 256)))
        solver = JS.FFMSolver(meta, data)
        state = solver.init(jax.random.key(0))
        state = solver.epoch(state)
        jax.block_until_ready(state)
        float(jnp.sum(state["a"]))
        t0 = time.perf_counter()
        for _ in range(epochs):
            state = solver.epoch(state)
        float(jnp.sum(state["a"]))
        dt = (time.perf_counter() - t0) / epochs
        print(json.dumps({"variant": variant, "cap": cap,
                          "epoch_seconds": round(dt, 4)}), flush=True)
        del solver, state, data
    patch("baseline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
