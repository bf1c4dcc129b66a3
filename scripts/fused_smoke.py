"""Hardware smoke for the fused table-space Mosaic kernels.

Builds a small FFM problem (f32, non-identity side fields), trains two
epochs with the fused table kernels FORCED (OCFFM_FUSED_TBL=1, which also
forces pregather) and with them OFF, same init key, and compares the final
parameters.  The two paths do the same math with different accumulation
order, so agreement is to f32 reassociation tolerance.

Exit 0 and print one OK line on success.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(fused: str):
    import jax
    import numpy as np

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.solver.jax_solver import FFMSolver, make_device_data
    from one_class_ffm_tpu.solver.params import HyperParams

    os.environ["OCFFM_FUSED_TBL"] = fused
    spec = SynthSpec(
        n_users=512, n_items=256, fu=2, fv=2,
        dims_u=(512, 64), dims_v=(256, 48), avg_pos=5.0, seed=0,
    )
    (du, dv), u_pad, v_pad, y_pad = build_padded(
        spec, dtype=np.float32, row_multiple=256
    )
    layout = BlockLayout.make(du, dv, self_side=True)
    hp = HyperParams(k=32, lam=0.05, omega=0.1, r=-1.0)
    import jax.numpy as jnp

    meta, data = make_device_data(u_pad, v_pad, y_pad, layout, hp,
                                  dtype=jnp.float32, blocked_bm=256)
    solver = FFMSolver(meta, data)
    state = solver.init(jax.random.key(0))
    for _ in range(2):
        state = solver.epoch(state)
    jax.block_until_ready(state)
    out = {f12: np.asarray(blk["W"]) for f12, blk in state["params"].items()}
    return solver, out


def main() -> int:
    import numpy as np

    s_on, p_on = run("1")
    used = [s_on._fused_tbl_side(b, first, s_on.meta.pad_d(
        b.d1 if first else b.d2)) is not None
        for b in s_on.meta.layout.all_blocks() for first in (True, False)]
    assert any(used), "no solve routed through the fused kernels"
    s_off, p_off = run("0")
    worst = 0.0
    for f12 in p_on:
        a, b = p_on[f12], p_off[f12]
        denom = np.maximum(np.abs(b), 1e-3)
        worst = max(worst, float(np.max(np.abs(a - b) / denom)))
        assert np.all(np.isfinite(a))
    ok = worst < 5e-3
    print(f"fused-table smoke: fused_solves={sum(used)}/{len(used)} "
          f"max_rel_diff={worst:.2e} -> {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
