"""Real 2-process jax.distributed epoch: sharded across processes (Gloo
collectives on CPU), result must match single-process execution."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_fingerprint() -> float:
    import jax

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.solver.jax_solver import FFMSolver, make_device_data
    from one_class_ffm_tpu.solver.params import HyperParams
    import jax.numpy as jnp

    spec = SynthSpec(n_users=64, n_items=32, avg_pos=4.0, seed=7,
                     dims_u=(64, 16), dims_v=(32, 12))
    (du, dv), u, v, y = build_padded(spec, dtype=np.float64, row_multiple=4)
    layout = BlockLayout.make(du, dv, self_side=True)
    meta, data = make_device_data(
        u, v, y, layout, HyperParams(k=4, lam=0.05, omega=0.1),
        dtype=jnp.float64,
    )
    solver = FFMSolver(meta, data)
    out = solver.epoch(solver.init(jax.random.key(0)))
    fp = 0.0
    for f12, blk in out["params"].items():
        fp += float(np.asarray(blk["W"]).sum()) + float(np.asarray(blk["H"]).sum())
    return fp


@pytest.mark.parametrize("mode", ["dp", "tp", "blk"])
def test_two_process_distributed_epoch(mode):
    """dp: rows sharded over a 1-D data mesh spanning both processes.
    tp: 2x2 data x model mesh with block tables row-sharded ACROSS the two
    processes (the web-scale layout, BASELINE.json configs[4]) — lookups
    and updates cross the process boundary via collectives.
    blk: the shard-aligned blocked stream + shard_map-local positive passes
    over a 4-shard data mesh spanning both processes."""
    expected = _single_process_fingerprint()
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # workers must not inherit the test's XLA device-count flag wholesale;
    # they configure their own 2 local devices
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), repr(expected), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=220)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert "MULTIHOST_OK" in out, out[-2000:]
