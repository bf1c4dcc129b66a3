"""Hardware smoke for the fused table-space Mosaic kernels.

Trains two epochs with the fused table kernels FORCED (OCFFM_FUSED_TBL=1,
which also forces pregather) on a small f32 FFM problem with non-identity
side fields, asserting the kernels compile, every solve eligible for them
routes through them, parameters move and stay finite.

Op-level hardware equivalence against the unfused path is gated separately
by scripts/fused_debug.py (per-op relative comparison) — comparing END
STATES across the two paths is NOT a valid gate at f32: their matmul
rounding differs, CG's loose stop rule (0.09 relative) flips iteration
counts on borderline solves, and two legitimate solver runs diverge at the
percent level after a couple of epochs.

Exit 0 and print one OK line on success.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np

    os.environ["OCFFM_FUSED_TBL"] = "1"
    import jax
    import jax.numpy as jnp

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.solver.jax_solver import FFMSolver, make_device_data
    from one_class_ffm_tpu.solver.params import HyperParams

    spec = SynthSpec(
        n_users=512, n_items=256, fu=2, fv=2,
        dims_u=(512, 64), dims_v=(256, 48), avg_pos=5.0, seed=0,
    )
    (du, dv), u_pad, v_pad, y_pad = build_padded(
        spec, dtype=np.float32, row_multiple=256
    )
    layout = BlockLayout.make(du, dv, self_side=True)
    hp = HyperParams(k=32, lam=0.05, omega=0.1, r=-1.0)
    meta, data = make_device_data(u_pad, v_pad, y_pad, layout, hp,
                                  dtype=jnp.float32, blocked_bm=256)
    solver = FFMSolver(meta, data)
    used = [solver._fused_tbl_side(b, first, meta.pad_d(
        b.d1 if first else b.d2)) is not None
        for b in meta.layout.all_blocks() for first in (True, False)]
    assert any(used), "no solve routed through the fused kernels"
    state = solver.init(jax.random.key(0))
    f12_0 = meta.layout.all_blocks()[0].f12
    w0 = np.asarray(state["params"][f12_0]["W"])
    o0 = float(solver.objective(state))
    for _ in range(2):
        state = solver.epoch(state)
    jax.block_until_ready(state)
    o1 = float(solver.objective(state))
    ok = True
    for f12, blk in state["params"].items():
        a = np.asarray(blk["W"])
        ok = ok and bool(np.all(np.isfinite(a)))
    moved = not np.allclose(np.asarray(state["params"][f12_0]["W"]), w0)
    ok = ok and moved and o1 < o0
    print(f"fused-table smoke: fused_solves={sum(used)}/{len(used)} "
          f"objective {o0:.4f} -> {o1:.4f} moved={moved} "
          f"-> {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
