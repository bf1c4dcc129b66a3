"""JAX evaluator vs the numpy metrics oracle on random tiny problems."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import dense_to_padded, make_problem
from one_class_ffm_tpu.data.dataset import PaddedFields
from one_class_ffm_tpu.evalx.jax_eval import Evaluator, make_eval_data
from one_class_ffm_tpu.evalx.numpy_metrics import validate_np


def build_eval(rng, cold_rows=(), self_side=True, catalog=None, row_pad=0):
    """Use the training users of a random problem as the 'test' set."""
    prob, params = make_problem(rng, self_side=self_side)
    m, n = prob.m, prob.n
    lay = prob.layout
    catalog = n if catalog is None else catalog
    Xu = [X.copy() for X in prob.Xu]
    for i in cold_rows:
        for X in Xu:
            X[i, :] = 0.0

    # numpy side ------------------------------------------------------------
    P = {b.f12: Xu[b.fi] @ params["W"][b.f12] for b in lay.cross_blocks()}
    Q = {b.f12: prob.Xv[b.fj] @ params["H"][b.f12] for b in lay.cross_blocks()}
    at = np.zeros(m)
    bt = np.zeros(n)
    for b in lay.user_self_blocks():
        at += np.einsum(
            "ik,ik->i", Xu[b.fi] @ params["W"][b.f12], Xu[b.fj] @ params["H"][b.f12]
        )
    for b in lay.item_self_blocks():
        bt += np.einsum(
            "ik,ik->i",
            prob.Xv[b.fi] @ params["W"][b.f12],
            prob.Xv[b.fj] @ params["H"][b.f12],
        )
    popular = rng.random(catalog)
    popular /= popular.sum()
    score_rows = []
    for i in range(m):
        if i in cold_rows:
            score_rows.append(popular.copy())
        else:
            z = bt + sum(Q[b.f12] @ P[b.f12][i] for b in lay.cross_blocks())
            score_rows.append(z)
    va_labels = [np.nonzero(prob.pos[i])[0] for i in range(m)]
    ref = validate_np(score_rows, va_labels, at, catalog, n)

    # jax side --------------------------------------------------------------
    m_pad = m + row_pad
    pads = [dense_to_padded(X, m_pad) for X in Xu]
    row_nnz = sum((X != 0).sum(axis=1) for X in Xu).astype(np.int32)
    uva = PaddedFields(
        m=m_pad,
        m_true=m,
        f=len(Xu),
        Ds=tuple(X.shape[1] for X in Xu),
        idx=tuple(p[0] for p in pads),
        val=tuple(p[1] for p in pads),
        freq=tuple(np.ones(X.shape[1]) for X in Xu),
        row_nnz=np.concatenate([row_nnz, np.zeros(row_pad, np.int32)]),
    )
    meta, data = make_eval_data(
        uva, va_labels, popular, n_items=n, n_items_true=n, layout=lay,
        dtype=jnp.float64,
    )
    ev = Evaluator(meta, data, chunk=5)
    jparams = {
        b.f12: {
            "W": jnp.asarray(params["W"][b.f12]),
            "H": jnp.asarray(params["H"][b.f12]),
        }
        for b in lay.all_blocks()
    }
    Qj = {f12: jnp.asarray(q) for f12, q in Q.items()}
    got = ev.validate(jparams, Qj, jnp.asarray(bt))
    return ref, got


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(cold_rows=(0, 4)),
        dict(self_side=False),
        dict(catalog=6),
        dict(row_pad=3),
        dict(cold_rows=(2,), row_pad=2, catalog=7),
    ],
)
def test_validate_matches_numpy(rng, kw):
    ref, got = build_eval(rng, **kw)
    for key, val in ref.items():
        assert key in got
        np.testing.assert_allclose(got[key], val, rtol=1e-8, atol=1e-10, err_msg=key)
