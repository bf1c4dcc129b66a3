"""Native C++ parser vs pure-Python parser: byte-equal outputs."""

import os
import subprocess

import numpy as np
import pytest

from one_class_ffm_tpu.data.io import parse_text_python

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "libocffm.so")


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not os.path.exists(LIB):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
    assert os.path.exists(LIB)


def check(path, has_label, ds=None):
    from one_class_ffm_tpu.data.native_io import parse_text_native

    a = parse_text_python(path, has_label, ds)
    b = parse_text_native(path, has_label, ds)
    for i, (x, y) in enumerate(zip(a, b)):
        if isinstance(x, np.ndarray):
            np.testing.assert_array_equal(x, y, err_msg=f"field {i}")
        else:
            assert x == y, (i, x, y)


CASES = {
    "basic.ffm": "0,2 0:1:1 1:3:0.5\n5 0:0:1\n",
    "blank_lines.ffm": "1 0:1:1\n\n2 0:2:1\n\n",
    "no_trailing_newline.ffm": "1 0:1:1\n3 1:2:0.25",
    "wide_fields.ffm": "7 0:1:1 3:9:2.5 2:0:1 1:1:1\n0 5:100:1\n",
    "float_vals.ffm": "1 0:1:0.333 1:2:1e-3\n2 0:3:-2.5\n",
    "multi_label.ffm": "9,1,4,4 0:0:1\n2,3 0:1:1 0:2:1\n",
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_labeled_equivalence(tmp_path, name):
    p = tmp_path / name
    p.write_text(CASES[name])
    check(str(p), has_label=True)


@pytest.mark.parametrize("name", ["basic.ffm", "wide_fields.ffm"])
def test_unlabeled_equivalence(tmp_path, name):
    # same contents, but first token parsed as a feature
    content = "\n".join(
        " ".join(ln.split()[1:]) for ln in CASES[name].splitlines() if ln
    )
    p = tmp_path / name
    p.write_text(content + "\n")
    check(str(p), has_label=False)


def test_ds_filter_equivalence(tmp_path):
    p = tmp_path / "f.ffm"
    p.write_text("1 0:5:1 1:9:1 2:3:1\n2 0:0:1 1:2:1\n")
    # field 2 dropped entirely (beyond ds), idx 9 dropped from field 1;
    # f must still count field 2 (reference semantics, ffm.cpp:103-104)
    check(str(p), has_label=True, ds=[6, 5])
    from one_class_ffm_tpu.data.native_io import parse_text_native

    out = parse_text_native(str(p), True, ds=[6, 5])
    assert out[7] == 3  # f = 3 despite the filter
    # kept: 0:5 (5 < 6), then 0:0 and 1:2; dropped: 1:9 (>= 5), 2:3 (fid >= 2)
    assert out[1].tolist() == [0, 0, 1]


def test_dispatch_prefers_native(tmp_path):
    """read_text_file must route to the native parser when the lib exists."""
    from one_class_ffm_tpu.data import io as io_mod

    p = tmp_path / "x.ffm"
    p.write_text("1 0:1:1\n")
    got = io_mod.read_text_file(str(p), True)
    ref = parse_text_python(str(p), True)
    for x, y in zip(got, ref):
        if isinstance(x, np.ndarray):
            np.testing.assert_array_equal(x, y)
        else:
            assert x == y


def test_native_model_reader_matches_python(tmp_path):
    """The C++ model-body reader (ocffm_read_model) and the pure-Python
    fallback produce identical params from the same text model."""
    import numpy as np

    from one_class_ffm_tpu.data import native_io
    from one_class_ffm_tpu.models.blocks import BlockLayout
    from one_class_ffm_tpu.train import load_text_model, save_text_model

    rng = np.random.default_rng(5)
    layout = BlockLayout.make((7, 3), (5, 2), self_side=True)
    k = 3
    params = {
        b.f12: {
            "W": rng.normal(size=(b.d1, k)),
            "H": rng.normal(size=(b.d2, k)),
        }
        for b in layout.all_blocks()
    }
    path = str(tmp_path / "m.txt")
    save_text_model(path, params, layout, k)

    assert os.path.exists(
        os.path.join(os.path.dirname(native_io.__file__), "..", "..",
                     "native", "libocffm.so")
    ), "native lib must be built for this test"
    lay_n, k_n, got_native = load_text_model(path)

    # force the Python fallback
    orig = native_io.read_model_body_native
    native_io.read_model_body_native = lambda *a, **kw: None
    try:
        lay_p, k_p, got_python = load_text_model(path)
    finally:
        native_io.read_model_body_native = orig

    assert k_n == k_p == k
    assert (lay_n.fu, lay_n.fv) == (lay_p.fu, lay_p.fv) == (2, 2)
    for b in layout.all_blocks():
        for name in ("W", "H"):
            np.testing.assert_array_equal(
                got_native[b.f12][name], got_python[b.f12][name]
            )
            # %.6g round-trip against the originals
            np.testing.assert_allclose(
                got_native[b.f12][name], params[b.f12][name],
                rtol=2e-5, atol=1e-7,
            )
