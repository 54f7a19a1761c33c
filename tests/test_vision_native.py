"""Native obj36 decoder: output equality with the Python loader, filters,
error handling. Reference row format: data_process/data/utils.py:20-89."""

import base64

import numpy as np
import pytest

from lako_tpu.data.vision import load_obj_tsv
from lako_tpu.data.vision_native import (load_obj_tsv_native,
                                         native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def _write_tsv(path, n_rows=5, n_boxes=7, feat_dim=32, seed=0):
    rs = np.random.default_rng(seed)
    rows = []
    # column order is OBJ36_FIELDNAMES (vision.py)
    for i in range(n_rows):
        b64 = lambda a: base64.b64encode(a.tobytes()).decode()
        boxes = rs.uniform(0, 100, size=(n_boxes, 4)).astype(np.float32)
        rows.append("\t".join([
            f"img_{i}", "480", "640",
            b64(rs.integers(0, 1600, n_boxes).astype(np.int64)),   # objects_id
            b64(rs.random(n_boxes).astype(np.float32)),            # objects_conf
            b64(rs.integers(0, 400, n_boxes).astype(np.int64)),    # attrs_id
            b64(rs.random(n_boxes).astype(np.float32)),            # attrs_conf
            str(n_boxes),                                          # num_boxes
            b64(boxes),                                            # boxes
            b64(rs.standard_normal((n_boxes, feat_dim)).astype(np.float32)),
        ]))
    path.write_text("\n".join(rows) + "\n")
    return path


def _assert_rows_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert set(ra) == set(rb)
        for k in ra:
            if isinstance(ra[k], np.ndarray):
                assert ra[k].dtype == rb[k].dtype, k
                np.testing.assert_array_equal(ra[k], rb[k], err_msg=k)
            else:
                assert ra[k] == rb[k], k


def test_native_matches_python(tmp_path):
    tsv = _write_tsv(tmp_path / "feats.tsv")
    py = load_obj_tsv(tsv, backend="python")
    nat = load_obj_tsv_native(tsv)
    _assert_rows_equal(py, nat)
    assert nat[0]["features"].shape == (7, 32)
    assert not nat[0]["features"].flags.writeable


def test_native_topk_and_filter(tmp_path):
    tsv = _write_tsv(tmp_path / "feats.tsv", n_rows=6)
    assert [r["img_id"] for r in load_obj_tsv_native(tsv, topk=2)] == \
        ["img_0", "img_1"]
    keep = {"img_1", "img_4"}
    py = load_obj_tsv(tsv, img_list=keep, backend="python")
    nat = load_obj_tsv_native(tsv, img_list=keep)
    _assert_rows_equal(py, nat)
    # topk applies AFTER the filter, like the Python loader
    assert [r["img_id"] for r in
            load_obj_tsv_native(tsv, topk=1, img_list=keep)] == ["img_1"]


def test_auto_backend_dispatches_native(tmp_path):
    tsv = _write_tsv(tmp_path / "feats.tsv", n_rows=3)
    _assert_rows_equal(load_obj_tsv(tsv, backend="python"),
                       load_obj_tsv(tsv, backend="auto"))


def test_native_rejects_malformed(tmp_path):
    bad = tmp_path / "bad.tsv"
    bad.write_text("img_0\t480\t640\tnot-base64!!!\n")
    with pytest.raises(ValueError, match="row 0"):
        load_obj_tsv_native(bad)


def test_native_crlf_and_missing_trailing_newline(tmp_path):
    tsv = _write_tsv(tmp_path / "feats.tsv", n_rows=2)
    text = tsv.read_text()
    crlf = tmp_path / "crlf.tsv"
    crlf.write_text(text.replace("\n", "\r\n").rstrip("\r\n"))
    py = load_obj_tsv(tsv, backend="python")
    nat = load_obj_tsv_native(crlf)
    _assert_rows_equal(py, nat)
