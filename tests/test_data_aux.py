"""Offline-construction auxiliaries: obj36 TSV, box norm, soft targets,
Dictionary/word vectors, VQA evaluator, prompt ablations."""

import base64
import json

import numpy as np
import pytest

from lako_tpu.data.prompt import (
    prompt_all_answers,
    prompt_best_answer,
    prompt_random_answer,
    truncate_dataset,
)
from lako_tpu.data.vision import load_obj_tsv, normalize_boxes, soft_target
from lako_tpu.data.vqa_eval import VQAEvaluator
from lako_tpu.text.dictionary import Dictionary, WordVectors, build_id2question


def _b64(arr):
    return base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode()


def test_obj_tsv_roundtrip(tmp_path):
    n, d = 3, 8
    rng = np.random.default_rng(0)
    boxes = np.array([[0, 0, 5, 5], [1, 1, 9, 9], [2, 2, 10, 10]], np.float32)
    feats = rng.normal(size=(n, d)).astype(np.float32)
    row = "\t".join([
        "img0", "10", "10",
        _b64(np.arange(n, dtype=np.int64)),
        _b64(np.ones(n, np.float32)),
        _b64(np.arange(n, dtype=np.int64)),
        _b64(np.ones(n, np.float32)),
        str(n), _b64(boxes), _b64(feats),
    ])
    p = tmp_path / "feats.tsv"
    p.write_text(row + "\n")
    data = load_obj_tsv(str(p))
    assert len(data) == 1
    item = data[0]
    assert item["num_boxes"] == n
    np.testing.assert_array_equal(item["boxes"], boxes)
    np.testing.assert_allclose(item["features"], feats)
    norm = normalize_boxes(item["boxes"], item["img_h"], item["img_w"])
    assert norm.max() <= 1.0 + 1e-5

    # cache path round-trip
    data2 = load_obj_tsv(str(p), cache_path=str(tmp_path / "c.pkl"))
    data3 = load_obj_tsv(str(p), cache_path=str(tmp_path / "c.pkl"))
    assert len(data3) == 1


def test_soft_target():
    t = soft_target({"cat": 0.9, "dog": 0.3, "zzz": 1.0}, {"cat": 0, "dog": 2}, 4)
    np.testing.assert_allclose(t, [0.9, 0, 0.3, 0])


def test_dictionary_roundtrip(tmp_path):
    d = Dictionary()
    ids = d.tokenize("What's the cat's name?", add_word=True)
    assert len(d) > 0
    d.dump_to_file(str(tmp_path / "dict.pkl"))
    d2 = Dictionary.load_from_file(str(tmp_path / "dict.pkl"))
    assert d2.word2idx == d.word2idx
    assert d2.tokenize("the cat", add_word=False)[0] == d.word2idx["the"]


def test_word_vectors(tmp_path):
    txt = tmp_path / "glove.txt"
    txt.write_text("cat 1.0 0.0\ndog 0.0 1.0\n")
    wv = WordVectors(str(txt))
    assert wv.dim == 2
    np.testing.assert_allclose(wv["cat"], [1.0, 0.0])
    assert "bird" not in wv
    assert wv["bird"].shape == (2,)  # deterministic unk init

    d = Dictionary()
    d.tokenize("cat dog bird", add_word=True)
    mat = wv.embedding_matrix(d)
    assert mat.shape == (4, 2)
    np.testing.assert_allclose(mat[d.word2idx["dog"]], [0.0, 1.0])
    np.testing.assert_allclose(mat[d.word2idx["bird"]], [0.0, 0.0])  # oov zeros

    # npz cache hit
    wv2 = WordVectors(str(txt))
    np.testing.assert_allclose(wv2.vectors, wv.vectors)


def test_vqa_evaluator(tmp_path):
    id2datum = {
        1: {"label": {"cat": 1.0}, "sent": "q1", "img_id": "i1"},
        2: {"label": {"dog": 0.3}, "sent": "q2", "img_id": "i2"},
    }
    ev = VQAEvaluator(id2datum)
    assert ev.evaluate({1: "cat", 2: "dog"}) == pytest.approx(0.65)
    assert ev.evaluate({1: "cat", 2: "bird"}) == pytest.approx(0.5)
    ev.dump_result({1: "cat"}, str(tmp_path / "r.json"), detail=True)
    out = json.loads((tmp_path / "r.json").read_text())
    assert out[0]["answer"] == "cat" and out[0]["question"] == "q1"


class TestPrompts:
    DATA = [{"sent": "what is it?", "label": {"cat": 1.0, "dog": 0.3},
             "question_id": 1}]

    def test_best(self):
        out = prompt_best_answer(self.DATA)
        assert out[0]["sent"] == "Fact: cat. [SEP] Question: what is it?"
        assert out[0]["fact"] == ""

    def test_all(self):
        out = prompt_all_answers(self.DATA)
        assert out[0]["sent"] == "Fact: cat, dog. [SEP] Question: what is it?"

    def test_random_and_split(self):
        out = prompt_random_answer(self.DATA, split_segment=True, seed=1)
        assert out[0]["sent"] == "Question: what is it?"
        assert out[0]["fact"] in ("Fact: cat.", "Fact: dog.")

    def test_no_mutation(self):
        _ = prompt_best_answer(self.DATA)
        assert self.DATA[0]["sent"] == "what is it?"

    def test_truncate(self):
        assert truncate_dataset([1, 2, 3], 2) == [1, 2]


def test_id2question():
    assert build_id2question([{"question_id": 7, "question": "q?"}]) == {"7": "q?"}
