"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Must set the env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from one_class_ffm_tpu.models.blocks import BlockLayout  # noqa: E402
from one_class_ffm_tpu.solver.params import HyperParams  # noqa: E402
from one_class_ffm_tpu.solver.oracle import OracleProblem  # noqa: E402


def random_sparse_dense(rng, m, d, max_nnz, binary_vals=False):
    """Dense (m, d) matrix where each row has 1..max_nnz nonzeros."""
    X = np.zeros((m, d))
    for i in range(m):
        nnz = rng.integers(1, max_nnz + 1)
        cols = rng.choice(d, size=min(nnz, d), replace=False)
        X[i, cols] = 1.0 if binary_vals else rng.uniform(0.5, 1.5, size=cols.size)
    return X


def make_problem(
    rng,
    m=13,
    n=9,
    Du=(7, 5),
    Dv=(6, 4),
    self_side=True,
    freq=False,
    omega=0.25,
    lam=0.05,
    r=-1.0,
    max_nnz=2,
    density=0.3,
):
    """Random tiny OracleProblem + matching random params."""
    Xu = [random_sparse_dense(rng, m, d, max_nnz) for d in Du]
    Xv = [random_sparse_dense(rng, n, d, max_nnz) for d in Dv]
    pos = rng.random((m, n)) < density
    # every user and item gets at least one positive to keep metrics sane
    for i in range(m):
        if not pos[i].any():
            pos[i, rng.integers(n)] = True
    layout = BlockLayout.make(Du, Dv, self_side)
    hp = HyperParams(k=3, lam=lam, omega=omega, r=r, freq=freq)
    freq_u = [X.astype(bool).sum(axis=0).astype(np.float64) for X in Xu]
    freq_v = [X.astype(bool).sum(axis=0).astype(np.float64) for X in Xv]
    prob = OracleProblem(
        layout=layout, hp=hp, Xu=Xu, Xv=Xv, pos=pos, freq_u=freq_u, freq_v=freq_v
    )
    params = {"W": {}, "H": {}}
    for b in layout.all_blocks():
        params["W"][b.f12] = rng.normal(scale=0.1 / np.sqrt(hp.k), size=(b.d1, hp.k))
        params["H"][b.f12] = rng.normal(scale=0.1 / np.sqrt(hp.k), size=(b.d2, hp.k))
    return prob, params


@pytest.fixture
def rng():
    return np.random.default_rng(0)
