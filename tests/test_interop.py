"""Interop with the C++ reference: model format, warm start."""

import os
import subprocess

import numpy as np
import pytest

from one_class_ffm_tpu.data.synth import SynthSpec, write_dataset
from one_class_ffm_tpu.train import TrainConfig, Trainer, load_text_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(REPO, "scripts", "ref_build", "train")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("interop")
    return write_dataset(
        str(out), SynthSpec(n_users=60, n_items=20, avg_pos=5.0, seed=13)
    )


def test_warm_start_from_own_model(dataset, tmp_path):
    item, train, va = dataset
    model = str(tmp_path / "m.txt")
    cfg = TrainConfig(item_path=item, train_path=train, test_path=va,
                      k=3, nr_pass=2, eval_every=2, dtype="float64",
                      model_path=model, eval_chunk=32)
    tr = Trainer(cfg)
    tr.init_state()
    tr.run(log=lambda *_: None)
    m0 = tr.validate()

    cfg2 = TrainConfig(item_path=item, train_path=train, test_path=va,
                       k=3, nr_pass=2, eval_every=2, dtype="float64",
                       init_model=model, eval_chunk=32)
    tr2 = Trainer(cfg2)
    tr2.init_state()
    # warm-started params reproduce the saved model's metrics before training
    m1 = tr2.validate()
    np.testing.assert_allclose(m1["ploss"], m0["ploss"], rtol=1e-3)
    tr2.run(log=lambda *_: None)  # and continue training without error


def test_warm_start_rejects_mismatched_k(dataset, tmp_path):
    item, train, va = dataset
    model = str(tmp_path / "m.txt")
    cfg = TrainConfig(item_path=item, train_path=train, k=3, nr_pass=1,
                      model_path=model, dtype="float64")
    tr = Trainer(cfg)
    tr.init_state()
    tr.run(log=lambda *_: None)
    cfg2 = TrainConfig(item_path=item, train_path=train, k=5, nr_pass=1,
                       init_model=model, dtype="float64")
    tr2 = Trainer(cfg2)
    with pytest.raises(ValueError, match="k=3"):
        tr2.init_state()


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="reference not built")
def test_reference_saved_model_loads(dataset, tmp_path):
    """A model saved by the C++ reference binary parses into our layout."""
    item, train, va = dataset
    model = str(tmp_path / "ref_model.txt")
    subprocess.run(
        [REF_BIN, "-k", "3", "-l", "0.05", "-w", "0.1", "-r", "-1",
         "-t", "2", "-c", "2", "-o", model, item, train],
        check=True, capture_output=True,
    )
    layout, k, params = load_text_model(model)
    assert k == 3
    assert layout.fu == 2 and layout.fv == 2
    for b in layout.all_blocks():
        assert params[b.f12]["W"].shape == (b.d1, 3)
        assert params[b.f12]["H"].shape == (b.d2, 3)
        assert np.all(np.isfinite(params[b.f12]["W"]))

    # and our trainer warm-starts from it
    cfg = TrainConfig(item_path=item, train_path=train, test_path=va,
                      k=3, nr_pass=1, eval_every=1, dtype="float64",
                      init_model=model, eval_chunk=32)
    tr = Trainer(cfg)
    tr.init_state()
    tr.run(log=lambda *_: None)
