"""Diagnose pregather HBM budgeting at a given config (no training).

Builds the bench problem, constructs the solver, and prints the device
memory stats, the computed pregather cap, per-side stream bytes, and the
kt/pregather/fused decisions.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.solver.jax_solver import FFMSolver, make_device_data
    from one_class_ffm_tpu.solver.params import HyperParams

    n_users = int(os.environ.get("BENCH_USERS", 2_000_000))
    n_items = int(os.environ.get("BENCH_ITEMS", 200_000))
    spec = SynthSpec(
        n_users=n_users, n_items=n_items, fu=2, fv=2,
        dims_u=(n_users, 1000), dims_v=(n_items, 500), avg_pos=5.0, seed=0,
        pop_skew=float(os.environ.get("BENCH_SKEW", 0.0)),
    )
    (du, dv), u_pad, v_pad, y_pad = build_padded(
        spec, dtype=np.float32, row_multiple=256)
    layout = BlockLayout.make(du, dv, self_side=True)
    hp = HyperParams(k=32, lam=0.05, omega=0.1, r=-1.0)
    meta, data = make_device_data(u_pad, v_pad, y_pad, layout, hp,
                                  dtype=jnp.bfloat16, blocked_bm=256)
    try:
        ms = jax.devices()[0].memory_stats() or {}
    except Exception as e:
        ms = {"error": repr(e)}
    print("memory_stats keys:", sorted(ms))
    for key in ("bytes_limit", "bytes_in_use", "peak_bytes_in_use"):
        if key in ms:
            print(f"  {key}: {ms[key] / (1 << 30):.2f} GiB")
    solver = FFMSolver(meta, data)
    print(f"pregather_cap: {solver.pregather_cap / (1 << 20):.1f} MiB")
    print(f"kt={solver.kt} kt_u={solver.kt_u} kt_v={solver.kt_v}")
    print(f"pregather_u={solver.pregather_u} pregather_v={solver.pregather_v}")
    print(f"blk_yt={solver.blk_yt} blk_gap={solver.blk_gap}")
    for side, key in (("u", "blk_u_take"), ("v", "blk_v_take")):
        if key in data:
            nb, maxc = data[key].shape
            kt_side = solver.kt_u if side == "u" else solver.kt_v
            lanes = 32 if kt_side else 128
            print(f"  {side}: n_blocks={nb} MAXC={maxc} "
                  f"stream={(nb * maxc * lanes * 2) / (1 << 20):.0f} MiB "
                  f"(kt={kt_side})")
        hd = key.replace("take", "hd_take")
        if hd in data:
            nch, chunk = data[hd].shape
            print(f"  {side} head tier: {nch} chunks x {chunk} "
                  f"({(nch * chunk * 32 * 2) / (1 << 20):.0f} MiB k-major)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
