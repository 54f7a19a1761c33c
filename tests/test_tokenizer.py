import numpy as np
import pytest

from lako_tpu.text.tokenizer import HFTokenizer, WordVocabTokenizer

CORPUS = [
    "question: what animal is shown? context: a cat sits on a mat.",
    "fact: cat is a kind of animal. dog is a kind of animal.",
    "question: what sport is this? context: a man riding a wave on a surfboard.",
]


class TestWordVocab:
    def test_roundtrip_t5(self):
        tok = WordVocabTokenizer.build(CORPUS, style="t5")
        ids = tok.encode("a cat sits")
        assert ids[-1] == tok.eos_id
        assert tok.decode(ids) == "a cat sits"

    def test_batch_shapes(self):
        tok = WordVocabTokenizer.build(CORPUS, style="t5")
        ids, mask = tok.batch_encode(["a cat", "a man riding a wave on a surfboard ."], 6)
        assert ids.shape == (2, 6) and mask.shape == (2, 6)
        assert ids.dtype == np.int32
        assert mask[0].sum() == 3  # 2 words + eos
        assert mask[1].all()  # truncated to max_length

    def test_bert_style(self):
        tok = WordVocabTokenizer.build(CORPUS, style="bert")
        ids = tok.encode("a cat")
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id

    def test_save_load(self, tmp_path):
        tok = WordVocabTokenizer.build(CORPUS)
        p = tmp_path / "word_vocab.json"
        tok.save(str(p))
        tok2 = WordVocabTokenizer.load(str(p))
        assert tok2.encode("a cat sits") == tok.encode("a cat sits")


class TestHFTokenizer:
    def test_train_unigram(self):
        tok = HFTokenizer.train_unigram(CORPUS * 20, vocab_size=200)
        ids = tok.encode("a cat sits on a mat")
        assert ids[-1] == tok.eos_id
        out = tok.decode(ids)
        assert "cat" in out

    def test_train_wordpiece(self):
        tok = HFTokenizer.train_wordpiece(CORPUS * 20, vocab_size=200)
        ids = tok.encode("a cat sits")
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
