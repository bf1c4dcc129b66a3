"""Standalone predictor: text-model and checkpoint paths must agree with the
trainer's own scoring."""

import os

import numpy as np
import pytest

from one_class_ffm_tpu.data.synth import SynthSpec, write_dataset
from one_class_ffm_tpu.train import TrainConfig, Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = tmp_path_factory.mktemp("predict")
    ds = write_dataset(str(out), SynthSpec(n_users=80, n_items=24, avg_pos=5.0, seed=9))
    model = str(out / "model.txt")
    ck = str(out / "ck")
    cfg = TrainConfig(
        item_path=ds[0], train_path=ds[1], test_path=ds[2],
        k=3, nr_pass=3, eval_every=3, dtype="float64",
        model_path=model, ckpt_dir=ck, eval_chunk=32,
    )
    tr = Trainer(cfg)
    tr.init_state()
    tr.run(log=lambda *_: None)
    return ds, model, ck, tr


def test_predict_from_text_model(trained):
    ds, model, ck, tr = trained
    from one_class_ffm_tpu.predict import main

    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([model, ds[0], ds[2], "-k", "5", "--labeled", "--platform", "cpu"])
    assert rc == 0
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    mt = tr.evaluator.meta.mt_true
    assert len(lines) == mt
    # predictor top-5 matches the trainer's own top-5 (same features/params;
    # text model is 6-sig-digit so allow rank swaps only between near-ties)
    ours = tr.predict_topk(k=5)
    agree = 0
    for ln, row in zip(lines, ours):
        got = [int(x) for x in ln.split(",")]
        agree += len(set(got) & set(int(x) for x in row))
    assert agree / (mt * 5) > 0.9


def test_predict_from_checkpoint(trained):
    ds, model, ck, tr = trained
    from one_class_ffm_tpu.predict import load_any_model, predict_topk_from_model

    layout, k, params = load_any_model(None, ck)
    assert layout.fu == tr.data.layout.fu
    ids, scores = predict_topk_from_model(
        layout, k, params, ds[0], ds[2], 5, with_scores=True, labeled=True
    )
    assert ids.shape[1] == 5
    assert scores.shape == ids.shape
    # scores are descending per row
    assert np.all(np.diff(scores, axis=1) <= 1e-12)
    # checkpoint is exact (fp64) -> should equal the trainer's ranking
    ours = tr.predict_topk(k=5)
    assert (ids == ours).mean() > 0.95


def test_predict_warns_on_cold_users_without_popularity(trained, tmp_path,
                                                        capsys):
    """Cold (featureless / out-of-vocabulary) user rows without
    --popular-from must emit a stderr warning, not silently score zero."""
    ds, model, ck, tr = trained
    from one_class_ffm_tpu.predict import main

    users = tmp_path / "cold_users.txt"
    # one warm user, one whose only feature is out-of-vocabulary (dropped by
    # the ds filter -> cold)
    users.write_text("0:0:1\n0:999999:1\n")
    rc = main([model, ds[0], str(users), "-k", "3", "--platform", "cpu"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "1 user row(s)" in err and "--popular-from" in err

    # with --popular-from: no warning, cold row ranked by popularity
    rc = main([model, ds[0], str(users), "-k", "3", "--platform", "cpu",
               "--popular-from", ds[1]])
    assert rc == 0
    out2 = capsys.readouterr()
    assert "--popular-from" not in out2.err
