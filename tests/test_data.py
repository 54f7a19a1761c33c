import json

import numpy as np
import pytest

from lako_tpu.core.config import ReaderDataConfig
from lako_tpu.data import (
    ReaderCollator,
    ReaderDataset,
    RetrieverCollator,
    TextCollator,
    batch_iterator,
    load_reader_data,
)
from tests.fixtures import make_examples, make_tokenizer


@pytest.fixture(scope="module")
def tok():
    return make_tokenizer()


@pytest.fixture(scope="module")
def examples():
    return make_examples(17, n_facts=4, seed=1)


def make_cfg(**kw):
    base = dict(n_context=4, text_maxlength=24, answer_maxlength=6, stream=2)
    base.update(kw)
    return ReaderDataConfig(**base)


class TestDataset:
    def test_formatting(self, examples):
        cfg = make_cfg()
        ds = ReaderDataset(examples, cfg)
        item = ds[0]
        assert item["question"].startswith("question: ")
        assert item["caption"].startswith("context: ")
        assert item["fact"].startswith("fact: ")
        assert len(item["fact_sentences"]) == 4
        assert item["score"] is not None

    def test_n_context_truncation(self, examples):
        ds = ReaderDataset(examples, make_cfg(n_context=2))
        assert len(ds[0]["fact_sentences"]) == 2

    def test_no_fact(self, examples):
        ds = ReaderDataset(examples, make_cfg(use_fact=False))
        assert ds[0]["fact"] is None


class TestReaderCollator:
    def test_shapes_stream2(self, examples, tok):
        cfg = make_cfg()
        ds = ReaderDataset(examples, cfg)
        col = ReaderCollator(cfg, tok)
        batch = col([ds[i] for i in range(3)])
        assert batch.passage_ids.shape == (3, 2, 24)
        assert batch.passage_mask.shape == (3, 2, 24)
        assert batch.labels.shape == (3, 6)
        assert batch.fact_spans.shape == (3, 4, 2)
        assert batch.valid.all()

    def test_shapes_stream1(self, examples, tok):
        cfg = make_cfg(stream=1)
        ds = ReaderDataset(examples, cfg)
        batch = ReaderCollator(cfg, tok)([ds[0]])
        assert batch.passage_ids.shape == (1, 1, 24)

    def test_labels_masked(self, examples, tok):
        cfg = make_cfg()
        ds = ReaderDataset(examples, cfg)
        batch = ReaderCollator(cfg, tok)([ds[0]])
        lab = batch.labels[0]
        n_valid = (lab != -100).sum()
        assert n_valid >= 2  # target word + eos
        assert (lab[n_valid:] == -100).all()
        # decodes back to the target
        dec = tok.decode([t for t in lab if t != -100])
        assert dec == ds[0]["target"]

    def test_fact_spans_decode_to_sentences(self, examples, tok):
        """Each span must cover exactly that fact's tokens in the fact passage."""
        cfg = make_cfg()
        ds = ReaderDataset(examples, cfg)
        batch = ReaderCollator(cfg, tok)([ds[i] for i in range(5)])
        for i in range(5):
            sents = ds[i]["fact_sentences"]
            for j, sent in enumerate(sents):
                s, e = batch.fact_spans[i, j]
                if e == 0:
                    continue  # truncated away
                span_ids = batch.passage_ids[i, 1, s:e]
                assert tok.decode(span_ids) == tok.decode(tok.encode(sent, add_special=False))

    def test_eval_padding(self, examples, tok):
        cfg = make_cfg()
        ds = ReaderDataset(examples, cfg)
        batch = ReaderCollator(cfg, tok)([ds[0]], pad_to=4)
        assert batch.passage_ids.shape[0] == 4
        assert batch.valid.tolist() == [True, False, False, False]


class TestRetrieverCollator:
    def test_shapes(self, examples, tok):
        cfg = make_cfg()
        ds = ReaderDataset(examples, cfg)
        col = RetrieverCollator(tok, n_context=4, question_maxlength=16, passage_maxlength=10)
        batch = col([ds[i] for i in range(2)])
        assert batch.question_ids.shape == (2, 16)
        assert batch.passage_ids.shape == (2, 4, 10)
        assert batch.gold_scores.shape == (2, 4)
        assert (batch.gold_scores[:, 0] == 1.0).all()


class TestTextCollator:
    def test_corpus_batch(self, tok):
        col = TextCollator(tok, maxlength=8)
        fact_ids, ids, mask = col([{"sentence": "cat says meow.", "id": 7}])
        assert fact_ids[0] == 7
        assert mask[0].sum() > 0


class TestLoader:
    def test_load_shard_and_default_scores(self, tmp_path, examples):
        data = [dict(e) for e in examples]
        for e in data:
            e["fact"] = [{k: v for k, v in f.items() if k != "score"} for f in e["fact"]]
        p = tmp_path / "train.json"
        p.write_text(json.dumps(data))
        full = load_reader_data(str(p))
        assert len(full) == len(examples)
        assert full[1]["fact"][0]["score"] == 0.5  # 1/(k+1), k=1
        shard0 = load_reader_data(str(p), global_rank=0, world_size=2)
        shard1 = load_reader_data(str(p), global_rank=1, world_size=2)
        assert len(shard0) + len(shard1) == len(examples)

    def test_batch_iterator_fixed_shapes(self, examples, tok):
        cfg = make_cfg()
        ds = ReaderDataset(examples, cfg)
        col = ReaderCollator(cfg, tok)
        batches = list(batch_iterator(ds, 4, col, shuffle=False))
        assert len(batches) == 5  # 17 -> 4*4 + padded final
        assert all(b.passage_ids.shape == (4, 2, 24) for b in batches)
        assert batches[-1].valid.sum() == 1

        train_batches = list(batch_iterator(ds, 4, col, shuffle=True, drop_last=True))
        assert len(train_batches) == 4


class TestSeparateFacts:
    def test_one_passage_per_fact(self, examples, tok):
        cfg = make_cfg(fact_use_way="separate")
        ds = ReaderDataset(examples, cfg)
        item = ds[0]
        assert isinstance(item["fact"], list)
        batch = ReaderCollator(cfg, tok)([item])
        # N = 1 question+caption passage + n_context fact passages
        assert batch.passage_ids.shape == (1, 1 + 4, 24)
        assert batch.passage_mask[0, 1].sum() > 0


class TestPrefetch:
    def test_prefetch_matches_sync(self, examples, tok):
        cfg = make_cfg()
        ds = ReaderDataset(examples, cfg)
        col = ReaderCollator(cfg, tok)
        sync = list(batch_iterator(ds, 4, col, shuffle=True, seed=3))
        pre = list(batch_iterator(ds, 4, col, shuffle=True, seed=3, prefetch=2))
        assert len(sync) == len(pre)
        for a, b in zip(sync, pre):
            np.testing.assert_array_equal(a.passage_ids, b.passage_ids)
            np.testing.assert_array_equal(a.labels, b.labels)

    def test_prefetch_propagates_errors(self, tok):
        cfg = make_cfg()

        class Boom:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                raise RuntimeError("boom")

        col = ReaderCollator(cfg, tok)
        with pytest.raises(RuntimeError, match="boom"):
            list(batch_iterator(Boom(), 4, col, prefetch=2))


class TestUnigramSpans:
    def test_fact_spans_with_trained_unigram(self):
        """Span-by-construction must hold for subword tokenizers too (the
        production path once a Unigram model is trained on the real corpus)."""
        from lako_tpu.text.tokenizer import HFTokenizer
        from tests.fixtures import corpus_sentences, make_examples

        corpus = corpus_sentences() * 30 + [
            "question: what sound does the animal make? context: fact:"] * 10
        tok = HFTokenizer.train_unigram(corpus, vocab_size=160)
        cfg = ReaderDataConfig(n_context=3, text_maxlength=40, answer_maxlength=6,
                               stream=2)
        ds = ReaderDataset(make_examples(4, 3, 2), cfg)
        batch = ReaderCollator(cfg, tok)([ds[i] for i in range(4)])
        for i in range(4):
            for j, sent in enumerate(ds[i]["fact_sentences"]):
                s, e = batch.fact_spans[i, j]
                if e == 0:
                    continue
                span_ids = [int(t) for t in batch.passage_ids[i, 1, s:e]]
                assert span_ids == tok.encode(sent, add_special=False)[: e - s]


def test_load_jsonl(tmp_path, examples):
    import json as _json

    p = tmp_path / "d.jsonl"
    p.write_text("\n".join(_json.dumps(e) for e in examples[:5]))
    rows = load_reader_data(str(p))
    assert len(rows) == 5
    assert rows[0]["question"] == examples[0]["question"]
    assert rows[3]["id"] == 3


def test_question_spans(examples, tok):
    cfg = make_cfg()
    ds = ReaderDataset(examples, cfg)
    batch = ReaderCollator(cfg, tok)([ds[0]])
    s, e = batch.question_spans[0]
    assert 0 < s < e
    # the span starts right after the "question:" prefix and runs to the end
    # of the question+caption passage
    assert e == int(batch.passage_mask[0, 0].sum())
    decoded = tok.decode(batch.passage_ids[0, 0, s:e])
    assert ds[0]["question"].split(" ", 1)[1].split("?")[0].split()[0] in decoded
