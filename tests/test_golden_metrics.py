"""Golden-metric tests (reference script/nDCG_degub_tool/ equivalent).

The reference's only real test injects synthetic monotone scores (z_j = n-j,
so the ranking is [0..9]) via -DEBUG_nDCG and compares per-user nDCG@10
against an independent Python calculation (gen_ans.py:27-42).  Here the same
protocol: hand-computed expectations for known label sets, checked against
both the numpy metrics oracle and the JAX evaluator (scores injected through
the cold-user popularity path, which returns the popularity vector verbatim).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from one_class_ffm_tpu.data.dataset import PaddedFields
from one_class_ffm_tpu.evalx.jax_eval import Evaluator, make_eval_data
from one_class_ffm_tpu.evalx.numpy_metrics import ladder_metrics_np
from one_class_ffm_tpu.models.blocks import BlockLayout


def dcg_at(ranks, k):
    """Independent hand formula: binary gain, 1/log2(rank+2), rank 0-based."""
    return sum(1.0 / math.log2(r + 2) for r in ranks if r < k)


def idcg_at(n_labels, k):
    return sum(1.0 / math.log2(r + 2) for r in range(min(n_labels, k)))


# catalog of 10, scores force ranking [0,1,2,...,9]
CASES = [
    # (labels, expected hit ranks)
    ([0, 1, 2], [0, 1, 2]),
    ([9], [9]),
    ([3, 7], [3, 7]),
    ([0, 5, 9, 12], [0, 5, 9]),  # label 12 outside catalog: counts in IDCG only
    ([2], [2]),
]


@pytest.mark.parametrize("labels,hit_ranks", CASES)
def test_numpy_metrics_against_hand_formula(labels, hit_ranks):
    z = np.arange(10, 0, -1, dtype=float)  # z_j = 10 - j -> ranking [0..9]
    hits, ndcgs, _ = ladder_metrics_np(z, np.array(labels), catalog=10)
    for s, K in enumerate((5, 10, 20, 40, 80)):
        kk = min(K, 10)
        exp_hits = sum(1 for r in hit_ranks if r < kk)
        exp_dcg = dcg_at(hit_ranks, kk)
        exp_idcg = idcg_at(len(labels), kk)
        assert hits[s] == exp_hits
        np.testing.assert_allclose(ndcgs[s], exp_dcg / exp_idcg, rtol=1e-12)


def test_jax_evaluator_against_hand_formula():
    """Inject the monotone scores through the cold-user popularity path."""
    mt = len(CASES)
    z = np.arange(10, 0, -1, dtype=float)
    uva = PaddedFields(
        m=mt, m_true=mt, f=1, Ds=(1,),
        idx=(np.zeros((mt, 1), np.int32),),
        val=(np.zeros((mt, 1)),),  # zero features -> every user is cold
        freq=(np.ones(1),),
        row_nnz=np.zeros(mt, np.int32),
    )
    va_labels = [np.array(l) for l, _ in CASES]
    layout = BlockLayout.make([1], [1], self_side=False)
    meta, data = make_eval_data(
        uva, va_labels, popular=z, n_items=10, n_items_true=10,
        layout=layout, dtype=jnp.float64,
    )
    ev = Evaluator(meta, data, chunk=4)
    params = {b.f12: {"W": jnp.zeros((1, 2)), "H": jnp.zeros((1, 2))}
              for b in layout.all_blocks()}
    Q = {b.f12: jnp.zeros((10, 2)) for b in layout.cross_blocks()}
    got = ev.validate(params, Q, jnp.zeros(10))
    for K in (5, 10):
        exp = np.mean([
            dcg_at(hr, min(K, 10)) / idcg_at(len(l), min(K, 10))
            for l, hr in CASES
        ])
        np.testing.assert_allclose(got[f"ndcg@{K}"], exp, rtol=1e-10)
        exp_p = np.mean([
            sum(1 for r in hr if r < min(K, 10)) / K for _, hr in CASES
        ])
        np.testing.assert_allclose(got[f"p@{K}"], exp_p, rtol=1e-10)


def test_training_is_deterministic(tmp_path):
    """Same seed + data -> bitwise-identical parameters (the JAX analog of
    the reference's structural race-freedom; SURVEY.md §5 sanitizers)."""
    from one_class_ffm_tpu.data.synth import SynthSpec, write_dataset
    from one_class_ffm_tpu.train import TrainConfig, Trainer

    ds = write_dataset(str(tmp_path), SynthSpec(n_users=50, n_items=16, seed=5))
    def run():
        cfg = TrainConfig(
            item_path=ds[0], train_path=ds[1], test_path=ds[2],
            k=3, nr_pass=2, eval_every=2, dtype="float64", seed=11,
            eval_chunk=32,
        )
        t = Trainer(cfg)
        t.init_state()
        t.run(log=lambda *_: None)
        return t.params_numpy()

    p1, p2 = run(), run()
    for f12 in p1:
        np.testing.assert_array_equal(p1[f12]["W"], p2[f12]["W"])
        np.testing.assert_array_equal(p1[f12]["H"], p2[f12]["H"])
