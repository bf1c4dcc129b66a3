"""Sparse op implementations agree (XLA vs Pallas-interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one_class_ffm_tpu.ops.sparse_ops import (
    _BM,
    project_pallas,
    project_xla,
    scatter_xla,
)


def test_project_pallas_interpret_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    m, p, d, k = _BM * 2, 3, 64, 8
    idx = jnp.asarray(rng.integers(0, d, size=(m, p)), jnp.int32)
    val = jnp.asarray(rng.random((m, p)), jnp.float32)
    W = jnp.asarray(rng.random((d, k)), jnp.float32)
    ref = project_xla(idx, val, W)
    with pltpu.force_tpu_interpret_mode():
        got = project_pallas(idx, val, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_dispatcher_cpu_uses_xla(rng):
    from one_class_ffm_tpu.ops.sparse_ops import project

    m, p, d, k = 16, 2, 8, 4
    idx = jnp.asarray(rng.integers(0, d, size=(m, p)), jnp.int32)
    val = jnp.asarray(rng.random((m, p)), jnp.float64)
    W = jnp.asarray(rng.random((d, k)), jnp.float64)
    got = project(idx, val, W)  # cpu backend -> xla path, f64 works
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(project_xla(idx, val, W)), rtol=1e-12
    )


def test_scatter_transpose_consistency(rng):
    """scatter is the adjoint of project: <P, Z> == <W, scatter(Z)>."""
    m, p, d, k = 32, 3, 16, 4
    idx = jnp.asarray(rng.integers(0, d, size=(m, p)), jnp.int32)
    val = jnp.asarray(rng.random((m, p)), jnp.float64)
    W = jnp.asarray(rng.random((d, k)), jnp.float64)
    Z = jnp.asarray(rng.random((m, k)), jnp.float64)
    lhs = float(jnp.sum(project_xla(idx, val, W) * Z))
    rhs = float(jnp.sum(W * scatter_xla(idx, val, Z, d)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
