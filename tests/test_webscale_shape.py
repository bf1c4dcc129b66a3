"""Reduced-scale web-config correctness run (BASELINE.json configs[4]).

The web-scale layout — rows data-parallel, block tables row-sharded on a
model axis, both user/item id spaces far larger than any toy test — executed
on the virtual 8-device CPU mesh at a scale the mesh can actually run
(the full 100M-positive config needs real chips; the 2M-user single-chip
run is in docs/PERF.md, and the cross-process table sharding is covered by
tests/test_multihost.py).  Asserts the epoch executes distributed end to end
with finite loss and that training actually reduces the objective.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
from one_class_ffm_tpu.models.blocks import BlockLayout
from one_class_ffm_tpu.parallel import shard_data, shard_state
from one_class_ffm_tpu.parallel.mesh import make_mesh2
from one_class_ffm_tpu.solver.jax_solver import FFMSolver, make_device_data
from one_class_ffm_tpu.solver.params import HyperParams


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_webscale_shape_sharded_epoch_runs_and_learns():
    spec = SynthSpec(
        n_users=32_000, n_items=4_000, fu=2, fv=2,
        dims_u=(32_000, 1000), dims_v=(4_000, 500), avg_pos=5.0, seed=0,
    )
    (du, dv), u, v, y = build_padded(spec, dtype=np.float32, row_multiple=16)
    assert y.nnz_true > 100_000  # a real positive stream, not a toy
    layout = BlockLayout.make(du, dv, self_side=True)
    hp = HyperParams(k=16, lam=0.05, omega=0.1, cg_max_iter=3)
    meta, data = make_device_data(
        u, v, y, layout, hp, dtype=jnp.float32, d_multiple=4
    )
    mesh = make_mesh2(2, 4)  # rows on 'data', big tables on 'model'
    sdata = shard_data(data, mesh)
    solver = FFMSolver(meta, sdata)
    state = solver.init(jax.random.key(0))
    state = shard_state(state, mesh, model_min_rows=256)
    sharded_tables = [
        t for blk in state["params"].values() for t in blk.values()
        if not t.sharding.is_fully_replicated
    ]
    assert sharded_tables, "no table row-sharded on the model axis"

    loss0 = float(solver.objective(state))
    state = solver.epoch(state)
    jax.block_until_ready(state)
    assert not state["a"].sharding.is_fully_replicated  # stayed distributed
    loss1 = float(solver.objective(state))
    assert np.isfinite(loss1)
    assert loss1 < loss0, (loss0, loss1)
