"""Edge cases: degenerate shapes and sparse extremes through the full stack."""

import numpy as np
import pytest

from one_class_ffm_tpu.train import TrainConfig, Trainer


def write(tmp_path, items, train, va=None):
    ip = tmp_path / "items.ffm"
    tp = tmp_path / "train.ffm"
    ip.write_text(items)
    tp.write_text(train)
    vp = None
    if va is not None:
        vp = tmp_path / "va.ffm"
        vp.write_text(va)
    return str(ip), str(tp), (str(vp) if vp else None)


def run(item, train, va, **kw):
    cfg = TrainConfig(
        item_path=item, train_path=train, test_path=va,
        dtype="float64", eval_chunk=8, row_multiple=2,
        nr_pass=2, eval_every=2, **kw,
    )
    tr = Trainer(cfg)
    tr.init_state()
    tr.run(log=lambda *_: None)
    return tr


def test_k1_rank_one(tmp_path):
    item, train, va = write(
        tmp_path,
        "0:0:1\n0:1:1\n0:2:1\n",
        "0,1 0:0:1\n2 0:1:1\n0 0:2:1\n",
        "2 0:0:1\n0 0:1:1\n",
    )
    tr = run(item, train, va, k=1)
    m = tr.validate()
    assert np.isfinite(m["ploss"]) and 0 <= m["auc"] <= 1


def test_user_with_no_features(tmp_path):
    # second training row has labels but zero features (cold in training)
    item, train, va = write(
        tmp_path,
        "0:0:1\n0:1:1\n0:2:1\n",
        "0 0:0:1\n1,2\n2 0:1:1\n",
        "1\n0 0:1:1\n",
    )
    tr = run(item, train, va, k=2)
    m = tr.validate()
    assert np.isfinite(m["ploss"])


def test_single_item_catalog(tmp_path):
    item, train, va = write(
        tmp_path,
        "0:0:1\n",
        "0 0:0:1\n0 0:1:1\n",
        "0 0:0:1\n",
    )
    tr = run(item, train, va, k=2)
    m = tr.validate()
    # with one item every user hits it at rank 0
    assert m["p@5"] == pytest.approx(1.0 / 5)
    assert m["ndcg@5"] == pytest.approx(1.0)


def test_labels_beyond_item_file(tmp_path):
    # train labels reference item id 5 but the item file has 2 rows: the
    # pair must be dropped from training (reference transY semantics) and
    # eval must not crash (popularity longer than catalog)
    item, train, va = write(
        tmp_path,
        "0:0:1\n0:1:1\n",
        "0,5 0:0:1\n1 0:1:1\n",
        "5,1 0:0:1\n",
    )
    tr = run(item, train, va, k=2)
    m = tr.validate()
    assert np.isfinite(m["ploss"])
    # label 5 is out of catalog: counts toward IDCG, can never be hit
    assert m["ndcg@5"] <= 1.0


def test_all_test_users_cold(tmp_path):
    item, train, va = write(
        tmp_path,
        "0:0:1\n0:1:1\n0:2:1\n",
        "0 0:0:1\n1 0:1:1\n2,0 0:2:1\n",
        "1 0:9:1\n2 0:8:1\n",  # features unseen in train -> ds-filtered -> cold
    )
    tr = run(item, train, va, k=2)
    m = tr.validate()
    # cold users rank by popularity; item 0 has 2 train clicks -> rank 0
    assert np.isfinite(m["auc"])
