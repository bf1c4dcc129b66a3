"""Data-prep pipelines on miniature raw fixtures mimicking the Kaggle schemas."""

import os
import random

import numpy as np
import pytest

from one_class_ffm_tpu.data.io import parse_text_python
from one_class_ffm_tpu.prep import kdd12, outbrain
from one_class_ffm_tpu.prep.encode import FeatureSpace, geo_handler
from one_class_ffm_tpu.prep.split import split_file, subsample


def write_kdd12_raw(path, n=300, seed=0):
    rng = random.Random(seed)
    cols = ["Click", "Impression", "DisplayURL", "AdID", "AdvertiserID",
            "Depth", "Position", "QueryID", "KeywordID", "TitleID",
            "DescriptionID", "UserID"]
    with open(path, "w") as fh:
        fh.write(",".join(cols) + "\n")
        for _ in range(n):
            click = rng.randint(0, 2)
            ad = rng.choice([11, 12, 13, 14, 15])
            fh.write(
                f"{click},1,{1000+ad},{ad},{rng.randint(1,3)},"
                f"{rng.randint(1,3)},1,{rng.randint(100,110)},{rng.randint(1,9)},"
                f"{rng.randint(1,9)},{rng.randint(1,9)},{rng.randint(0,20)}\n"
            )


def test_kdd12_pipeline(tmp_path):
    raw = str(tmp_path / "training.csv")
    write_kdd12_raw(raw)
    out = str(tmp_path / "out")
    rc = kdd12.main(["all", "--raw", raw, "--out", out, "--threshold", "2"])
    assert rc == 0
    for enc, nf in [("ffm", 2), ("fm", 1), ("mf", 1)]:
        up = os.path.join(out, f"user.{enc}")
        ap = os.path.join(out, f"ad.{enc}")
        u = parse_text_python(up, has_label=True)
        a = parse_text_python(ap, has_label=False)
        assert u[7] == nf, enc  # f = number of fields
        assert a[0].shape[0] - 1 > 0
        # every label id is a valid ad row
        assert u[5].max() < a[0].shape[0] - 1
        # splits exist and partition the user file
        n_lines = sum(1 for _ in open(up))
        n_split = sum(
            sum(1 for _ in open(os.path.join(out, f"user.{t}.{enc}")))
            for t in ("tr", "va", "te")
        )
        assert n_split == n_lines
    # ad.ffm has 4 fields (reference ad_ffm.py layout)
    a = parse_text_python(os.path.join(out, "ad.ffm"), has_label=False)
    assert a[7] == 4
    # AdID.map row index == ad row index
    with open(os.path.join(out, "AdID.map")) as fh:
        lines = [ln.split() for ln in fh]
    assert [int(x[0]) for x in lines] == list(range(len(lines)))


def write_outbrain_raw(raw_dir, n=400, seed=0):
    rng = random.Random(seed)
    os.makedirs(raw_dir, exist_ok=True)
    ads = [(i, 500 + i % 7, 30 + i % 5, 40 + i % 3) for i in range(1, 13)]
    with open(os.path.join(raw_dir, "clicks_train.csv"), "w") as fh:
        fh.write("display_id,ad_id,clicked\n")
        for d in range(n):
            ad = rng.choice(ads)[0]
            fh.write(f"{d},{ad},{rng.randint(0,1)}\n")
    with open(os.path.join(raw_dir, "cv_events.csv"), "w") as fh:
        fh.write("display_id,uuid,document_id,timestamp,platform,geo_location\n")
        geos = ["US>CA>803", "US>NY", "CA", "817", "GB>ENG>123"]
        for d in range(n):
            fh.write(
                f"{d},u{d%37},{700 + d % 11},{d},{rng.randint(1,3)},"
                f"{rng.choice(geos)}\n"
            )
    with open(os.path.join(raw_dir, "promoted_content.csv"), "w") as fh:
        fh.write("ad_id,document_id,campaign_id,advertiser_id\n")
        for ad, doc, camp, adv in ads:
            fh.write(f"{ad},{doc},{camp},{adv}\n")
    with open(os.path.join(raw_dir, "documents_meta.csv"), "w") as fh:
        fh.write("document_id,source_id,publisher_id,publish_time\n")
        for doc in sorted({a[1] for a in ads} | {700 + i for i in range(11)}):
            fh.write(f"{doc},{doc%13},{doc%7},2016-01-01\n")


def test_outbrain_pipeline(tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    write_outbrain_raw(raw)
    rc = outbrain.main(
        ["all", "--raw", raw, "--out", out, "--threshold", "3"]
    )
    assert rc == 0
    item = parse_text_python(os.path.join(out, "item.ffm"), has_label=False)
    assert item[7] == 2
    n_items = item[0].shape[0] - 1
    assert n_items > 0
    for tag in ("tr", "va", "te"):
        u = parse_text_python(os.path.join(out, f"ob.{tag}.ffm"), has_label=True)
        if u[5].size:
            assert u[5].max() < n_items  # labels index item rows
    # subsamples exist
    assert os.path.exists(os.path.join(out, "ob.va.sub.ffm"))
    # mf context uses a single uuid field
    u = parse_text_python(os.path.join(out, "ob.tr.mf"), has_label=True)
    assert u[7] == 1


def test_geo_handler_variants():
    sp = FeatureSpace(1)
    assert len(geo_handler(sp, 0, "US>CA>803")) == 3
    assert len(geo_handler(sp, 0, "US>CA")) == 2
    assert len(geo_handler(sp, 0, "US>803")) == 2
    assert len(geo_handler(sp, 0, "US")) == 1
    assert len(geo_handler(sp, 0, "803")) == 1
    # same value seen twice -> same id
    a = geo_handler(sp, 0, "US")[0]
    b = geo_handler(sp, 0, "US")[0]
    assert a == b


def test_split_is_deterministic(tmp_path):
    p = tmp_path / "x.ffm"
    p.write_text("".join(f"{i} 0:{i}:1\n" for i in range(200)))
    tr, va, te = split_file(str(p), seed=0)
    tr2 = open(tr).read()
    split_file(str(p), seed=0)
    assert open(tr).read() == tr2
    n = sum(1 for _ in open(tr)) + sum(1 for _ in open(va)) + sum(1 for _ in open(te))
    assert n == 200
    sub = subsample(str(p))
    assert 0 < sum(1 for _ in open(sub)) < 200


def test_prep_output_trains(tmp_path):
    """The whole chain: raw csv -> prep -> trainer runs on the output."""
    raw = str(tmp_path / "training.csv")
    write_kdd12_raw(raw, n=600)
    out = str(tmp_path / "out")
    kdd12.main(["all", "--raw", raw, "--out", out, "--threshold", "1"])
    from one_class_ffm_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        item_path=os.path.join(out, "ad.ffm"),
        train_path=os.path.join(out, "user.tr.ffm"),
        test_path=os.path.join(out, "user.va.ffm"),
        k=3,
        nr_pass=2,
        eval_every=2,
        dtype="float64",
        eval_chunk=32,
    )
    tr = Trainer(cfg)
    tr.init_state()
    tr.run(log=lambda *_: None)
    m = tr.validate()
    assert 0.0 <= m["auc"] <= 1.0


def write_kkbox_raw(raw_dir, n=500, seed=0):
    rng = random.Random(seed)
    os.makedirs(raw_dir, exist_ok=True)
    users = [f"u{i}" for i in range(40)]
    songs = [f"s{i}" for i in range(25)]
    with open(os.path.join(raw_dir, "train.csv"), "w") as fh:
        fh.write("msno,song_id,source_system_tab,target\n")
        for _ in range(n):
            fh.write(
                f"{rng.choice(users)},{rng.choice(songs)},lib,{rng.randint(0,1)}\n"
            )
    with open(os.path.join(raw_dir, "songs.csv"), "w") as fh:
        fh.write("song_id,song_length,genre_ids,artist_name,language\n")
        for s in songs:
            genres = "|".join(str(rng.randint(100, 105)) for _ in range(rng.randint(1, 2)))
            fh.write(f"{s},200000,{genres},artist{rng.randint(1,8)},{rng.choice([3,17,52])}\n")
    with open(os.path.join(raw_dir, "members.csv"), "w") as fh:
        fh.write("msno,city,bd,gender,registered_via\n")
        for u in users:
            fh.write(f"{u},{rng.randint(1,5)},0,{rng.choice(['male','female',''])},{rng.randint(3,9)}\n")


def test_kkbox_pipeline(tmp_path):
    from one_class_ffm_tpu.prep import kkbox

    raw = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    write_kkbox_raw(raw)
    rc = kkbox.main(["all", "--raw", raw, "--out", out, "--threshold", "2"])
    assert rc == 0
    song = parse_text_python(os.path.join(out, "top_song.ffm"), has_label=False)
    assert song[7] == 2
    n_songs = song[0].shape[0] - 1
    assert n_songs > 0
    lst = parse_text_python(os.path.join(out, "listener.ffm"), has_label=True)
    assert lst[7] == 2
    assert lst[5].max() < n_songs  # labels are song rows
    # genre multi-values produce several field-1 features per song
    assert (song[1] == 1).sum() >= n_songs
    for t in ("tr", "va", "te"):
        assert os.path.exists(os.path.join(out, f"listener.{t}.ffm"))
    # trains end-to-end
    from one_class_ffm_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        item_path=os.path.join(out, "top_song.ffm"),
        train_path=os.path.join(out, "listener.tr.ffm"),
        test_path=os.path.join(out, "listener.va.ffm"),
        k=3, nr_pass=2, eval_every=2, dtype="float64", eval_chunk=16,
    )
    tr = Trainer(cfg)
    tr.init_state()
    tr.run(log=lambda *_: None)
