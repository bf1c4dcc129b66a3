"""Benchmark: one-class FFM training throughput on the current chip.

Prints ONE JSON line:
  {"metric": "examples_per_sec_per_chip_k32", "value": N,
   "unit": "examples/s", "vs_baseline": R}

"examples" = training rows (users) swept per alternating Gauss-Newton epoch
(every field-pair block: gradient + CG-capped-20 + Newton update), at k=32 on
a synthetic FFM dataset (2 user fields x 2 item fields, ~5 positives/user) —
the BASELINE.json headline config.  vs_baseline compares against the C++
reference binary's measured examples/s on the same data when
``scripts/reference_baseline.json`` exists (see scripts/measure_reference.py),
else 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    n_users = int(os.environ.get("BENCH_USERS", 200_000))
    n_items = int(os.environ.get("BENCH_ITEMS", 20_000))
    k = int(os.environ.get("BENCH_K", 32))
    epochs = int(os.environ.get("BENCH_EPOCHS", 4))
    dtype_name = os.environ.get("BENCH_DTYPE", "auto")

    import jax

    # the tunneled TPU intermittently reports UNAVAILABLE at backend init
    # (verify skill gotchas; a sustained outage ate the round-5 final
    # queue) — retry a few times before giving up so a transient blip
    # doesn't void a benchmark run
    for attempt in range(5):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if attempt == 4:
                raise
            print(f"# backend init failed (attempt {attempt + 1}/5): "
                  f"{str(e)[:120]} — retrying in 60s", file=sys.stderr)
            time.sleep(60)
            try:  # drop the memoized init failure so the retry is real
                jax.extend.backend.clear_backends()
            except Exception:
                pass
    import jax.numpy as jnp
    import numpy as np

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.solver.jax_solver import FFMSolver, make_device_data
    from one_class_ffm_tpu.solver.params import HyperParams

    spec = SynthSpec(
        n_users=n_users,
        n_items=n_items,
        fu=2,
        fv=2,
        dims_u=(n_users, 1000),
        dims_v=(n_items, 500),
        avg_pos=5.0,
        seed=0,
        pop_skew=float(os.environ.get("BENCH_SKEW", 0.0)),
    )
    # rows padded to 256 so the Pallas projection kernel's row blocks divide
    (du, dv), u_pad, v_pad, y_pad = build_padded(
        spec, dtype=np.float32, row_multiple=256
    )
    layout = BlockLayout.make(du, dv, self_side=True)
    hp = HyperParams(k=k, lam=0.05, omega=0.1, r=-1.0,
                     cg_precond=os.environ.get("BENCH_CG_PRECOND", "auto"))
    if dtype_name == "auto":
        # the shipped TrainConfig default: bf16 storage on TPU (quality
        # gated by the multi-seed parity run, docs/PARITY.md), f32 on CPU
        dtype_name = (
            "bfloat16" if jax.default_backend() not in ("cpu",) else "float32"
        )
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    meta, data = make_device_data(
        u_pad, v_pad, y_pad, layout, hp, dtype=dtype,
        blocked_bm=int(os.environ.get("BENCH_BLOCKED_BM", 256)))
    solver = FFMSolver(meta, data)
    state = solver.init(jax.random.key(0))

    f12_0 = meta.layout.all_blocks()[0].f12
    w_init = np.asarray(state["params"][f12_0]["W"])
    params0 = {
        f12: {name: t.copy() for name, t in blk.items()}
        for f12, blk in state["params"].items()
    }

    # warmup: compile + one epoch
    state = solver.epoch(state)
    jax.block_until_ready(state)

    # Timing protocol: epochs 2..epochs+1 from a fresh init.  Early epochs do
    # the full CG work (up to 20 iterations per block table); once the model
    # converges CG exits after ~1 iteration and an epoch costs ~20x less, so
    # timing converged epochs would overstate throughput.
    #
    # Best-of-N segments: this sandbox's chip intermittently drops into a
    # ~3.5x-slower mode (throttle/relay degradation — the same config
    # measured 201k and 56k examples/s minutes apart).  Each segment resets
    # to the IDENTICAL post-init state (same CG iteration schedule — later
    # epochs converge and would cheat) and re-runs warmup-epoch + epochs
    # 2..N+1; the best segment is the chip's real capability, and all
    # segment values are reported for honesty.
    reps = int(os.environ.get("BENCH_REPS", 3))
    seg_times = []
    for _ in range(max(1, reps)):
        st = solver.refresh_caches({"params": {
            f12: {name: t.copy() for name, t in blk.items()}
            for f12, blk in params0.items()
        }})
        st = solver.epoch(st)  # epoch 1 (untimed, matches the warmup above)
        float(st[solver.yt_key].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(epochs):
            st = solver.epoch(st)
        jax.block_until_ready(st)
        # paranoid sync: a host-side scalar fetch cannot return before the
        # device work is done (block_until_ready alone proved unreliable
        # through this sandbox's dispatch relay)
        float(st[solver.yt_key].reshape(-1)[0])
        seg_times.append(time.perf_counter() - t0)
        state = st
    dt = min(seg_times)

    # guard: the timed work must be real optimization, not a degenerate
    # graph — parameters moved, every residual is finite (uses only arrays
    # the epoch already produced; no extra compiled program, which matters
    # because this sandbox pays minutes per XLA compile over the tunnel)
    w_now = np.asarray(state["params"][f12_0]["W"])
    assert np.all(np.isfinite(w_now)) and not np.allclose(w_now, w_init)
    assert np.all(np.isfinite(np.asarray(state[solver.yt_key])))

    eps = n_users * epochs / dt

    vs = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "scripts", "reference_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as fh:
            base = json.load(fh)
        ref_eps = base.get("examples_per_sec")
        if ref_eps:
            vs = eps / ref_eps

    print(
        json.dumps(
            {
                "metric": "examples_per_sec_per_chip_k32",
                "value": round(eps, 1),
                "unit": "examples/s",
                "vs_baseline": round(vs, 3),
                "dtype": dtype_name,
                "segments_eps": [round(n_users * epochs / t, 1)
                                 for t in seg_times],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
