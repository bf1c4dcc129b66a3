"""Localize hardware divergence of the k-major (kt) kernels.

Same protocol as fused_debug.py: one jitted program compares every kt op
against its row-major counterpart on the same state, per cross/self solve —
fused table kernels, the plain kt hv, the kt gradient scatter (identity
sides), and the kt gap — printing max relative diff per (block, half, op).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np

    os.environ["OCFFM_FUSED_TBL"] = "1"
    os.environ["OCFFM_KT"] = "1"
    import jax
    import jax.numpy as jnp

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.solver.jax_solver import (
        FFMSolver, gather_blocked_rows, gather_blocked_rows_t,
        make_device_data, pos_gap_blocked, pos_gap_kt_pallas,
    )
    from one_class_ffm_tpu.solver.params import HyperParams

    spec = SynthSpec(
        n_users=512, n_items=256, fu=2, fv=2,
        dims_u=(512, 64), dims_v=(256, 48), avg_pos=5.0, seed=0,
    )
    (du, dv), u_pad, v_pad, y_pad = build_padded(
        spec, dtype=np.float32, row_multiple=256
    )
    layout = BlockLayout.make(du, dv, self_side=True)
    import os as _os
    # OCFFM_DEBUG_K / OCFFM_DEBUG_DTYPE / OCFFM_DEBUG_LAM /
    # OCFFM_DEBUG_OMEGA: re-gate at a failing configuration (the
    # round-5 k=16 bf16 divergence was invisible at the k=32 f32
    # defaults)
    _k = int(_os.environ.get("OCFFM_DEBUG_K", 32))
    _lam = float(_os.environ.get("OCFFM_DEBUG_LAM", 0.05))
    _om = float(_os.environ.get("OCFFM_DEBUG_OMEGA", 0.1))
    hp = HyperParams(k=_k, lam=_lam, omega=_om, r=-1.0)
    _dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        _os.environ.get("OCFFM_DEBUG_DTYPE", "float32")]
    meta, data = make_device_data(u_pad, v_pad, y_pad, layout, hp,
                                  dtype=_dt, blocked_bm=256)
    s_kt = FFMSolver(meta, data)
    assert s_kt.kt and s_kt.kt_u and s_kt.kt_v, "kt did not engage"
    os.environ["OCFFM_KT"] = "0"
    s_rm = FFMSolver(meta, data)
    assert not s_rm.kt

    state = s_kt.init(jax.random.key(0))

    @jax.jit
    def diffs(state):
        out = {}

        def rel(a, b):
            return jnp.max(jnp.abs(a - b)) / (1e-30 + jnp.max(jnp.abs(b)))

        sa, sb = s_kt._cache_sasb(state["P"], state["Q"])
        for b in meta.layout.epoch_order():
            for first in (True, False):
                tag = f"{b.kind}{b.f12}_{'W' if first else 'H'}"
                if b.kind == "uv":
                    pre = "blk_u_" if first else "blk_v_"
                    bm = (meta.blocked_bm_u if first
                          else meta.blocked_bm_v)
                    B1 = (state["Q"][b.f12] if first else state["P"][b.f12])
                    rows_rm = gather_blocked_rows(B1, data[pre + "take"])
                    rows_kt = gather_blocked_rows_t(B1, data[pre + "take"])
                    g_on, q_on = s_kt._grad_cross(
                        state, b, first, with_diag_pos=True,
                        rows_pre=rows_kt, kt=True)
                    g_off, q_off = s_rm._grad_cross(
                        state, b, first, with_diag_pos=True,
                        rows_pre=rows_rm)
                    hv_on = s_kt._hv_cross(state, b, first,
                                           rows_pre=rows_kt, kt=True)
                    hv_off = s_rm._hv_cross(state, b, first,
                                            rows_pre=rows_rm)
                    dP = 0.11 * (state["P"][b.f12] if first
                                 else state["Q"][b.f12])
                    gap_on = pos_gap_kt_pallas(dP, rows_kt,
                                               data[pre + "own"], bm)
                    gap_off = pos_gap_blocked(dP, rows_rm,
                                              data[pre + "own"], None, bm)
                    out[tag + "_gap"] = rel(gap_on, gap_off)
                else:
                    dim = meta.pad_d(b.d1 if first else b.d2)
                    if s_kt._fused_tbl_side(b, first, dim,
                                            "grad_self") is None:
                        continue
                    g_on, q_on = s_kt._grad_self(state, b, first, sa, sb,
                                                 want_diag=True)
                    g_off, q_off = s_rm._grad_self(state, b, first, sa, sb,
                                                   want_diag=True)
                    hv_on = s_kt._hv_self(state, b, first)
                    hv_off = s_rm._hv_self(state, b, first)
                out[tag + "_grad"] = rel(g_on, g_off)
                d_on = s_kt._diag_H(state, b, first, q_on)
                d_off = s_rm._diag_H(state, b, first, q_off)
                out[tag + "_diag"] = rel(d_on, d_off)
                V = g_off * 0.37
                out[tag + "_hv"] = rel(hv_on(V), hv_off(V))
        return out

    res = {k: float(v) for k, v in diffs(state).items()}
    scale = 5e-3  # both stacks carry their own f32 MXU rounding
    bad = {k: v for k, v in res.items() if v > scale}
    for k in sorted(res):
        print(f"{k:24s} rel={res[k]:.3e}")
    print("FAIL: " + ", ".join(sorted(bad)) if bad else
          f"OK: all {len(res)} kt ops within {scale} relative")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
