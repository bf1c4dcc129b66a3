"""Validate the numpy oracle against first principles:

  * analytic block gradients match finite differences of the exact objective
  * CG solves each (exactly quadratic) block subproblem: objective decreases
  * a full oracle epoch monotonically decreases the objective
"""

import numpy as np
import pytest

from one_class_ffm_tpu.solver import oracle as orc

from conftest import make_problem


def _num_grad(prob, params, f12, side, eps=1e-6):
    key = "W" if side else "H"
    tbl = params[key][f12]
    G = np.zeros_like(tbl)
    for i in range(tbl.shape[0]):
        for j in range(tbl.shape[1]):
            old = tbl[i, j]
            tbl[i, j] = old + eps
            fp = orc.objective(prob, params)
            tbl[i, j] = old - eps
            fm = orc.objective(prob, params)
            tbl[i, j] = old
            G[i, j] = (fp - fm) / (2 * eps)
    return G


@pytest.mark.parametrize("self_side", [True, False])
@pytest.mark.parametrize("freq", [False, True])
def test_gradients_match_finite_differences(rng, self_side, freq):
    prob, params = make_problem(
        rng, m=7, n=5, Du=(4, 3), Dv=(3,), self_side=self_side, freq=freq
    )
    for b in prob.layout.epoch_order():
        for side in (True, False):
            G, _ = orc.grad_and_hv(prob, params, b, side)
            Gn = _num_grad(prob, params, b.f12, side)
            np.testing.assert_allclose(G, Gn, rtol=1e-5, atol=1e-7)


def test_hessian_vector_matches_finite_difference_of_gradient(rng):
    prob, params = make_problem(rng, m=6, n=5, Du=(4,), Dv=(3, 3))
    eps = 1e-6
    for b in prob.layout.epoch_order():
        for side in (True, False):
            key = "W" if side else "H"
            G0, hv = orc.grad_and_hv(prob, params, b, side)
            V = np.random.default_rng(1).normal(size=params[key][b.f12].shape)
            p2 = {
                "W": {k: v.copy() for k, v in params["W"].items()},
                "H": {k: v.copy() for k, v in params["H"].items()},
            }
            p2[key][b.f12] = p2[key][b.f12] + eps * V
            G1, _ = orc.grad_and_hv(prob, p2, b, side)
            np.testing.assert_allclose(hv(V), (G1 - G0) / eps, rtol=1e-4, atol=1e-6)


def test_block_half_step_decreases_objective(rng):
    prob, params = make_problem(rng, m=10, n=8)
    f0 = orc.objective(prob, params)
    b = prob.layout.epoch_order()[0]
    S = orc.solve_block_half(prob, params, b, True)
    params["W"][b.f12] = params["W"][b.f12] + S
    f1 = orc.objective(prob, params)
    assert f1 < f0


@pytest.mark.parametrize("self_side", [True, False])
def test_oracle_epoch_monotone_descent(rng, self_side):
    prob, params = make_problem(rng, self_side=self_side)
    f = orc.objective(prob, params)
    for _ in range(4):
        params = orc.oracle_epoch(prob, params)
        f2 = orc.objective(prob, params)
        assert f2 < f + 1e-12
        f = f2


def test_mf_oracle_converges_to_als_fixed_point(rng):
    """mf-mf--ns with identity features: subproblem per side is exactly the
    weighted-ALS normal equations; several epochs should reach a point where
    another epoch barely moves the objective."""
    m, n, k = 8, 6, 3
    prob, params = make_problem(
        rng, m=m, n=n, Du=(m,), Dv=(n,), self_side=False, max_nnz=1
    )
    # identity features
    prob.Xu = [np.eye(m)]
    prob.Xv = [np.eye(n)]
    for _ in range(40):
        params = orc.oracle_epoch(prob, params)
    f1 = orc.objective(prob, params)
    params = orc.oracle_epoch(prob, params)
    f2 = orc.objective(prob, params)
    assert 0 <= f1 - f2 < 1e-4 * max(1.0, abs(f1))
