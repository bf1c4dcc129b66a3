"""Data layer tests: parser, field split, transY, padding."""

import os

import numpy as np

from one_class_ffm_tpu.data import (
    read_data,
    split_fields,
    trans_y,
    pad_fields,
    pad_labels,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


SAMPLE_TRAIN = """\
0,2 0:0:1 1:3:0.5
1 0:1:1 1:0:1 1:1:2
0 1:2:1
"""

SAMPLE_ITEM = """\
0:0:1
0:1:1
0:2:1
"""


def test_read_labeled(tmp_path):
    path = _write(tmp_path, "tr.ffm", SAMPLE_TRAIN)
    d = read_data(path, has_label=True)
    assert d.m == 3
    assert d.n == 3  # labels 0,1,2
    assert d.f == 2
    assert d.y.nnz == 4
    np.testing.assert_array_equal(d.y.indptr, [0, 2, 3, 4])
    np.testing.assert_array_equal(d.y.col, [0, 2, 1, 0])
    # popularity: item0 twice, items 1,2 once each, normalized
    np.testing.assert_allclose(d.popular, [0.5, 0.25, 0.25])
    assert d.x_fid.shape[0] == 6


def test_read_item_side(tmp_path):
    path = _write(tmp_path, "item.ffm", SAMPLE_ITEM)
    d = read_data(path, has_label=False)
    assert d.m == 3 and d.f == 1 and d.y is None


def test_ds_filter_drops_unseen(tmp_path):
    # train dims: field0 -> 2 (idx 0,1), field1 -> 4 (idx 0..3)
    tr = _write(tmp_path, "tr.ffm", SAMPLE_TRAIN)
    dtr = read_data(tr, has_label=True)
    ftr = split_fields(dtr)
    assert ftr.Ds == [2, 4]
    te = _write(tmp_path, "te.ffm", "1 0:5:1 1:2:1\n0 2:0:1\n")
    dte = read_data(te, has_label=True, ds=ftr.Ds)
    # 0:5 dropped (idx >= 2), 2:0 dropped (field beyond train fields),
    # but f still counts the dropped field id (reference ffm.cpp:103-104)
    assert dte.f == 3
    assert dte.x_fid.tolist() == [1]
    fte = split_fields(dte, f_override=ftr.f)
    assert fte.f == 2


def test_split_fields(tmp_path):
    path = _write(tmp_path, "tr.ffm", SAMPLE_TRAIN)
    d = read_data(path, has_label=True)
    fd = split_fields(d)
    assert fd.f == 2
    np.testing.assert_array_equal(fd.indptr[0], [0, 1, 2, 2])
    np.testing.assert_array_equal(fd.idx[0], [0, 1])
    np.testing.assert_array_equal(fd.indptr[1], [0, 1, 3, 4])
    np.testing.assert_array_equal(fd.idx[1], [3, 0, 1, 2])
    np.testing.assert_allclose(fd.val[1], [0.5, 1, 2, 1])
    np.testing.assert_array_equal(fd.freq[1], [1, 1, 1, 1])
    np.testing.assert_array_equal(fd.row_nnz(), [2, 3, 1])


def test_trans_y(tmp_path):
    path = _write(tmp_path, "tr.ffm", SAMPLE_TRAIN)
    d = read_data(path, has_label=True)
    vy = trans_y(d.y, n_items=3)
    # item->user: item0 <- users {0, 2}; item1 <- user 1; item2 <- user 0
    np.testing.assert_array_equal(vy.indptr, [0, 2, 3, 4])
    np.testing.assert_array_equal(vy.col, [0, 2, 1, 0])
    # labels with idx >= n_items are dropped
    vy2 = trans_y(d.y, n_items=2)
    assert vy2.nnz == 3


def test_pad_fields_roundtrip(tmp_path):
    path = _write(tmp_path, "tr.ffm", SAMPLE_TRAIN)
    fd = split_fields(read_data(path, has_label=True))
    pf = pad_fields(fd, row_multiple=4)
    assert pf.m == 4 and pf.m_true == 3
    # projection through padded arrays == dense X @ W for a random table
    rngv = np.random.default_rng(0)
    for fi in range(fd.f):
        W = rngv.normal(size=(fd.Ds[fi], 3))
        dense = np.zeros((fd.m, fd.Ds[fi]))
        for i in range(fd.m):
            s, e = fd.indptr[fi][i], fd.indptr[fi][i + 1]
            dense[i, fd.idx[fi][s:e]] = fd.val[fi][s:e]
        P_dense = dense @ W
        gathered = W[pf.idx[fi]] * pf.val[fi][:, :, None]
        P_pad = gathered.sum(axis=1)
        np.testing.assert_allclose(P_pad[:3], P_dense, atol=1e-12)
        np.testing.assert_allclose(P_pad[3:], 0, atol=1e-12)


def test_pad_labels(tmp_path):
    path = _write(tmp_path, "tr.ffm", SAMPLE_TRAIN)
    d = read_data(path, has_label=True)
    pl = pad_labels(d.y, m_pad=4, n_pad=3, nnz_multiple=8)
    assert pl.nnz == 8 and pl.nnz_true == 4
    assert pl.w.sum() == 4
    np.testing.assert_array_equal(pl.count_u[:3], [2, 1, 1])
    np.testing.assert_array_equal(pl.count_v, [2, 1, 1])
    assert (pl.u[4:] == 3).all() and (pl.v[4:] == 3).all()


def test_binary_dataset_cache(tmp_path):
    """The binary cache returns the identical parse, is actually USED on a
    repeat read (same mtime+size, different bytes -> old parse comes back),
    and invalidates on content change or ds mismatch."""
    from one_class_ffm_tpu.data.io import read_text_file

    p = tmp_path / "tr.ffm"
    p.write_text("0,2 0:0:1 1:3:2\n1 0:1:1\n2 1:2:0.5\n")
    path = str(p)
    first = read_text_file(path, has_label=True, cache=True)
    assert (tmp_path / "tr.ffm.ocffm.npz").exists()
    again = read_text_file(path, has_label=True, cache=True)
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)

    # same size + mtime, different bytes: the cache must win (keyed on
    # mtime+size, not content) — proves the second read came from the cache
    st = p.stat()
    p.write_text("1,2 0:0:9 1:3:9\n0 0:1:9\n0 1:2:9.9\n"[: st.st_size])
    os.utime(path, ns=(st.st_mtime_ns, st.st_mtime_ns))
    cached = read_text_file(path, has_label=True, cache=True)
    np.testing.assert_array_equal(cached[3], first[3])  # old x_val

    # content + mtime change invalidates
    p.write_text("1 0:0:7\n2 0:1:7\n3 1:2:7\n")
    fresh = read_text_file(path, has_label=True, cache=True)
    assert float(fresh[3][0]) == 7.0

    # ds filter participates in the key
    with_ds = read_text_file(path, has_label=True, ds=[1, 0], cache=True)
    assert with_ds[1].size < fresh[1].size
    no_ds = read_text_file(path, has_label=True, cache=True)
    np.testing.assert_array_equal(no_ds[3], fresh[3])


def test_pad_labels_shard_aligned():
    """shard_rows layout: every shard's rows own a contiguous equal-length
    slice of the stream, u stays non-decreasing, pads carry w == 0 and the
    owning shard's last row id, and true entries/counts are preserved."""
    from one_class_ffm_tpu.data.dataset import Interactions

    rng = np.random.default_rng(3)
    m, n, S = 32, 9, 4
    counts = rng.integers(0, 6, size=m)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    col = rng.integers(0, n, size=indptr[-1])
    y = Interactions(m=m, n=n, indptr=indptr, col=col)
    pl = pad_labels(y, m_pad=m, n_pad=n + 1, shard_rows=m // S)
    L = pl.nnz // S
    assert pl.nnz_true == indptr[-1] and pl.w.sum() == indptr[-1]
    R = m // S
    for s in range(S):
        sl = slice(s * L, (s + 1) * L)
        us, ws = pl.u[sl], pl.w[sl]
        assert np.all(np.diff(us) >= 0)  # non-decreasing inside the shard
        assert np.all((us >= s * R) & (us < (s + 1) * R))
        real = ws == 1.0
        # real entries reproduce the shard's true stream
        want_u = np.repeat(np.arange(s * R, (s + 1) * R), counts[s * R:(s + 1) * R])
        np.testing.assert_array_equal(us[real], want_u)
        assert np.all(us[~real] == (s + 1) * R - 1)  # pads: shard's last row
        assert np.all(pl.v[sl][~real] == n)  # ghost item id
    # global non-decreasing (plain ops' seg_sorted hint stays valid)
    assert np.all(np.diff(pl.u) >= 0)


def test_blocked_layout_shard_local_src():
    """shard_rows layout emits src relative to the owning shard's stream
    slice; reassembling src + shard offset reproduces the global layout."""
    from one_class_ffm_tpu.data.dataset import Interactions
    from one_class_ffm_tpu.ops.sparse_ops import make_blocked_layout

    rng = np.random.default_rng(5)
    m, n, S, BM = 32, 9, 4, 4
    counts = rng.integers(0, 6, size=m)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    col = rng.integers(0, n, size=indptr[-1])
    y = Interactions(m=m, n=n, indptr=indptr, col=col)
    pl = pad_labels(y, m_pad=m, n_pad=n + 1, shard_rows=m // S)
    blk = make_blocked_layout(pl.u, pl.v, m, BM, max_pad_ratio=50.0,
                              shard_rows=m // S)
    assert blk is not None and "src_abs" in blk
    L = pl.nnz // S
    n_blocks = m // BM
    lo = (np.arange(n_blocks) // ((m // S) // BM) * L)[:, None]
    valid = blk["own"] < BM
    np.testing.assert_array_equal(
        (blk["src"] + lo)[valid], blk["src_abs"][valid])
    assert blk["src"].max() < L
    # global (non-shard) build agrees on take/own
    g = make_blocked_layout(pl.u, pl.v, m, BM, max_pad_ratio=50.0)
    np.testing.assert_array_equal(blk["own"], g["own"])
    np.testing.assert_array_equal(blk["take"], g["take"])
    np.testing.assert_array_equal(blk["src_abs"][valid], g["src"][valid])


def test_vectorized_generator_structure():
    """generate_vectorized produces a valid, class-structured dataset fast."""
    import time

    from one_class_ffm_tpu.data.synth import SynthSpec, build_padded, generate_vectorized

    spec = SynthSpec(n_users=5000, n_items=400, avg_pos=5.0, seed=3)
    t0 = time.time()
    (du, dv), u, v, y = generate_vectorized(spec, row_multiple=8)
    fast_t = time.time() - t0
    assert u.m % 8 == 0 and u.m_true == 5000
    assert v.m_true == 400
    # every user has >= 1 positive and ids are in range
    import numpy as np

    assert y.nnz_true > 5000 * 2
    assert y.u[: y.nnz_true].max() < 5000
    assert y.v[: y.nnz_true].max() < 400
    # (u, v) pairs are unique
    key = y.u[: y.nnz_true].astype(np.int64) * 400 + y.v[: y.nnz_true]
    assert len(np.unique(key)) == y.nnz_true
    # planted structure: in-class positives dominate
    rng = np.random.default_rng(spec.seed)
    u_class = rng.integers(0, spec.n_classes, size=5000)
    v_class = rng.integers(0, spec.n_classes, size=400)
    frac = (u_class[y.u[: y.nnz_true]] == v_class[y.v[: y.nnz_true]]).mean()
    assert frac > 0.5
    # id field is identity; val padding zeros beyond true rows
    assert (u.val[0][5000:] == 0).all()
    # much faster than the loop generator at this size
    t0 = time.time()
    build_padded(spec, row_multiple=8)
    loop_t = time.time() - t0
    assert fast_t < loop_t
