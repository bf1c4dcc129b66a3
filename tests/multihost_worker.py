"""Worker for the 2-process distributed epoch test (spawned by
test_multihost.py).  Builds the identical problem in every process, assembles
globally-sharded arrays, runs one epoch, and process 0 checks the parameter
fingerprint against the single-process value passed on argv."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_enable_x64", True)  # match the test's fp64 reference

pid = int(sys.argv[1])
port = sys.argv[2]
expected = float(sys.argv[3])
mode = sys.argv[4] if len(sys.argv) > 4 else "dp"  # "dp" | "tp"

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

from one_class_ffm_tpu.parallel import make_mesh  # noqa: E402
from one_class_ffm_tpu.parallel.multihost import (  # noqa: E402
    make_global_data,
    make_global_state,
)
from one_class_ffm_tpu.data.synth import SynthSpec, build_padded  # noqa: E402
from one_class_ffm_tpu.models.blocks import BlockLayout  # noqa: E402
from one_class_ffm_tpu.solver.jax_solver import (  # noqa: E402
    FFMSolver,
    make_device_data,
)
from one_class_ffm_tpu.solver.params import HyperParams  # noqa: E402

SPEC = SynthSpec(n_users=64, n_items=32, avg_pos=4.0, seed=7,
                 dims_u=(64, 16), dims_v=(32, 12))


def build():
    blocked = mode == "blk"
    # blk: shard-aligned stream over the 4 global devices + blocked layout
    # with shard-local src — the shard_map passes cross the PROCESS boundary
    # here (2 of the 4 shards live on the other process)
    (du, dv), u, v, y = build_padded(
        SPEC, dtype=np.float64, row_multiple=16 if blocked else 4,
        shard_rows=16 if blocked else 0)
    layout = BlockLayout.make(du, dv, self_side=True)
    hp = HyperParams(k=4, lam=0.05, omega=0.1)
    import jax.numpy as jnp

    return make_device_data(u, v, y, layout, hp, dtype=jnp.float64,
                            blocked_bm=4 if blocked else 0,
                            blocked_shards=4 if blocked else 1)


meta, data = build()
if mode == "blk":
    assert meta.blocked_shards == 4 and meta.blocked_bm_u == 4, (
        meta.blocked_shards, meta.blocked_bm_u)
assert jax.device_count() == 4, jax.device_count()
if mode == "tp":
    # 2x2 data x model mesh with the MODEL axis spanning the two processes:
    # block tables row-shard ACROSS hosts (the web-scale layout,
    # BASELINE.json configs[4]) and lookups/updates cross the process
    # boundary via XLA collectives (Gloo here, DCN on real pods).
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()).reshape(2, 2).T
    mesh = Mesh(devs, ("data", "model"))
else:
    mesh = make_mesh()  # 1-D data mesh over all 4 devices

import dataclasses  # noqa: E402

# init/refresh only (no epoch): a plain-view solver avoids the mesh
# requirement of blocked_shards metas
meta_plain = dataclasses.replace(
    meta, blocked_shards=1, blocked_bm_u=0, blocked_bm_v=0)
solver_local = FFMSolver(meta_plain, data)
state_host = jax.tree.map(np.asarray, solver_local.init(jax.random.key(0)))
data_host = jax.tree.map(np.asarray, data)

gdata = make_global_data(data_host, mesh)
gsolver = FFMSolver(meta, gdata, mesh=mesh if mode == "blk" else None)
if mode == "blk" and gsolver.blk_yt:
    # the sharded solver carries the residual in blocked slot orders —
    # rebuild its state from the same params via ITS OWN refresh (same
    # floats, carrier layout chosen by the solver)
    from jax.sharding import PartitionSpec as P  # noqa: E402

    from one_class_ffm_tpu.parallel.multihost import make_global  # noqa: E402

    gparams = {
        f12: {k: make_global(v, mesh, P()) for k, v in blk.items()}
        for f12, blk in state_host["params"].items()
    }
    gstate = gsolver.refresh_caches({"params": gparams})
else:
    gstate = make_global_state(
        state_host, mesh, model_min_rows=8 if mode == "tp" else 0
    )
if mode == "tp":
    sharded_tables = [
        t for blk in gstate["params"].values() for t in blk.values()
        if not t.sharding.is_fully_replicated
    ]
    assert sharded_tables, "no table sharded across the model axis"

out = gsolver.epoch(gstate)
# fingerprint over params; GSPMD may leave tables sharded across processes
# (identity-field tables ride the data axis), so allgather before fetching
from jax.experimental import multihost_utils

fp = 0.0
for f12, blk in out["params"].items():
    fp += float(multihost_utils.process_allgather(blk["W"], tiled=True).sum())
    fp += float(multihost_utils.process_allgather(blk["H"], tiled=True).sum())
print(f"[{pid}] fingerprint={fp!r} expected={expected!r}", flush=True)
assert abs(fp - expected) <= 1e-6 * max(1.0, abs(expected)), (fp, expected)
print(f"[{pid}] MULTIHOST_OK", flush=True)
