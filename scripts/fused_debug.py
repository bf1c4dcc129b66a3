"""Localize hardware divergence of the fused table kernels.

Builds the fused_smoke problem, then compares EVERY fused op against its
unfused counterpart on the same state, per block table, in one jitted
program (one remote compile): gradient, Jacobi diag, and one Hv evaluation.
Prints max|diff| per (block, half, op) so the broken kernel is identified
without bisecting epoch runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np

    os.environ["OCFFM_FUSED_TBL"] = "1"  # also forces pregather
    import jax
    import jax.numpy as jnp

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.solver.jax_solver import (
        FFMSolver, gather_blocked_rows, make_device_data,
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
    s_on = FFMSolver(meta, data)
    os.environ["OCFFM_FUSED_TBL"] = "0"
    os.environ["OCFFM_BLK_PREGATHER"] = "1"  # keep pregather identical
    s_off = FFMSolver(meta, data)
    assert s_on.fused_tbl and not s_off.fused_tbl
    assert s_on.pregather_u == s_off.pregather_u

    state = s_on.init(jax.random.key(0))

    @jax.jit
    def diffs(state):
        out = {}

        def rel(a, b):
            return jnp.max(jnp.abs(a - b)) / (1e-30 + jnp.max(jnp.abs(b)))

        sa, sb = s_on._cache_sasb(state["P"], state["Q"])
        for b in meta.layout.epoch_order():
            for first in (True, False):
                dim = meta.pad_d(b.d1 if first else b.d2)
                if s_on._fused_tbl_side(b, first, dim) is None:
                    continue
                tag = f"{b.kind}{b.f12}_{'W' if first else 'H'}"
                rows_pre = None
                if b.kind == "uv":
                    pre = "blk_u_" if first else "blk_v_"
                    B1 = (state["Q"][b.f12] if first else state["P"][b.f12])
                    rows_pre = gather_blocked_rows(B1, data[pre + "take"])
                    g_on, q_on = s_on._grad_cross(
                        state, b, first, with_diag_pos=True,
                        rows_pre=rows_pre)
                    g_off, q_off = s_off._grad_cross(
                        state, b, first, with_diag_pos=True,
                        rows_pre=rows_pre)
                    hv_on = s_on._hv_cross(state, b, first,
                                           rows_pre=rows_pre)
                    hv_off = s_off._hv_cross(state, b, first,
                                             rows_pre=rows_pre)
                else:
                    g_on, q_on = s_on._grad_self(state, b, first, sa, sb,
                                                 want_diag=True)
                    g_off = s_off._grad_self(state, b, first, sa, sb)
                    q_off = None
                    hv_on = s_on._hv_self(state, b, first)
                    hv_off = s_off._hv_self(state, b, first)
                out[tag + "_grad"] = rel(g_on, g_off)
                d_on = s_on._diag_H(state, b, first, q_on)
                d_off = s_off._diag_H(state, b, first, q_off)
                out[tag + "_diag"] = rel(d_on, d_off)
                V = g_off * 0.37  # arbitrary direction, same for both
                out[tag + "_hv"] = rel(hv_on(V), hv_off(V))
        return out

    res = {k: float(v) for k, v in diffs(state).items()}
    # relative gate: the fused kernels run their f32 dots at HIGHEST
    # (f32-exact) while the unfused MXU one-hot path keeps the default
    # reduced-precision decomposition — the residual diff is the UNFUSED
    # side's rounding, ~1e-3 relative at f32 worst case
    scale = 5e-3
    bad = {k: v for k, v in res.items() if v > scale}
    for k in sorted(res):
        print(f"{k:24s} rel={res[k]:.3e}")
    print("FAIL: " + ", ".join(sorted(bad)) if bad else
          f"OK: all {len(res)} fused ops within {scale} relative")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
