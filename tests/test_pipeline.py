"""End-to-end pipeline test: every CLI stage over the synthetic fixture,
exchanging reference-schema JSON artifacts."""

import json
from pathlib import Path

import numpy as np
import pytest

from lako_tpu.pipeline.cli import main as cli_main
from tests.fixtures import ANIMALS, SOUNDS, corpus_sentences, make_examples


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("pipeline")

    train = make_examples(48, n_facts=3, seed=0)
    evald = make_examples(12, n_facts=3, seed=99)
    (wd / "train.json").write_text(json.dumps(train))
    (wd / "eval.json").write_text(json.dumps(evald))
    corpus = [{"sentence": s, "id": i} for i, s in enumerate(corpus_sentences())]
    (wd / "corpus.json").write_text(json.dumps(corpus))

    t5_cfg = {
        "vocab_size": 64, "d_model": 64, "d_kv": 16, "d_ff": 128,
        "num_layers": 2, "num_decoder_layers": 2, "num_heads": 4,
        "relative_attention_num_buckets": 8, "dropout_rate": 0.0,
    }
    reader_cfg = {
        "checkpoint_dir": str(wd / "ckpt"), "name": "reader",
        "per_device_batch_size": 1, "eval_batch_size": 8, "epochs": 14,
        "early_stop": 14, "eval_max_length": 4, "use_remat": False,
        "dtype": "float32",
        "data": {"n_context": 3, "text_maxlength": 24, "answer_maxlength": 4,
                 "stream": 2},
        "optim": {"optim": "adamw", "lr": 3e-3, "weight_decay": 0.0},
    }
    retriever_cfg = {
        "checkpoint_dir": str(wd / "ckpt"), "name": "retriever",
        "per_device_batch_size": 1, "eval_batch_size": 8, "epochs": 2,
        "early_stop": 2, "n_context": 3, "dtype": "float32",
        "retriever": {
            "bert": {"vocab_size": 200, "hidden_size": 32,
                     "num_hidden_layers": 1, "num_attention_heads": 2,
                     "intermediate_size": 64, "max_position_embeddings": 64},
            "indexing_dimension": 16, "question_maxlength": 16,
            "passage_maxlength": 12,
        },
        "optim": {"optim": "adamw", "lr": 1e-3, "weight_decay": 0.0},
    }
    (wd / "t5_cfg.json").write_text(json.dumps(t5_cfg))
    (wd / "reader_cfg.json").write_text(json.dumps(reader_cfg))
    (wd / "retriever_cfg.json").write_text(json.dumps(retriever_cfg))
    return wd


def test_build_tokenizers(workdir):
    cli_main(["build-tokenizer", "--from-json", str(workdir / "train.json"),
              str(workdir / "corpus.json"), "--out", str(workdir / "tok.json"),
              "--style", "t5", "--kind", "word"])
    cli_main(["build-tokenizer", "--from-json", str(workdir / "train.json"),
              str(workdir / "corpus.json"), "--out", str(workdir / "btok.json"),
              "--style", "bert", "--kind", "word"])
    assert (workdir / "tok.json").exists()
    assert (workdir / "btok.json").exists()


@pytest.mark.slow
def test_full_pipeline_stages(workdir, capsys):
    wd = workdir
    # tokenizers (function-scope order: ensure built)
    if not (wd / "tok.json").exists():
        test_build_tokenizers(workdir)

    # 1. reader training
    cli_main(["train-reader", "--config", str(wd / "reader_cfg.json"),
              "--t5-config", str(wd / "t5_cfg.json"),
              "--train-data", str(wd / "train.json"),
              "--eval-data", str(wd / "eval.json"),
              "--tokenizer", str(wd / "tok.json")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["best_dev_em"] > 0.5, out

    import os
    ckpt = str(wd / "ckpt" / "reader" / "checkpoint" / "best_dev")
    assert os.path.exists(ckpt)

    # 2. eval with cross-attention scores on both splits
    for split in ("train", "eval"):
        cli_main(["eval-reader", "--config", str(wd / "reader_cfg.json"),
                  "--t5-config", str(wd / "t5_cfg.json"),
                  "--eval-data", str(wd / f"{split}.json"),
                  "--model-path", ckpt,
                  "--tokenizer", str(wd / "tok.json"),
                  "--write-crossattention-scores", str(wd / f"{split}_scored.json"),
                  "--write-results", str(wd / f"{split}_results.json")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["em"] > 0.5
    scored = json.loads((wd / "eval_scored.json").read_text())
    # scores must be attached and normalized per example
    row = scored[0]["fact"]
    s = sum(f["score"] for f in row[:3])
    assert abs(s - 1.0) < 1e-4, row

    # 3. retriever distillation
    cli_main(["train-retriever", "--config", str(wd / "retriever_cfg.json"),
              "--train-data", str(wd / "train_scored.json"),
              "--eval-data", str(wd / "eval_scored.json"),
              "--tokenizer", str(wd / "btok.json")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["best_inversions"])
    retr_ckpt = str(wd / "ckpt" / "retriever" / "checkpoint" / "best_dev")
    assert os.path.exists(retr_ckpt)

    # 4. embed corpus into dense index
    cli_main(["embed-facts", "--config", str(wd / "retriever_cfg.json"),
              "--model-path", retr_ckpt,
              "--corpus", str(wd / "corpus.json"),
              "--out", str(wd / "index"),
              "--tokenizer", str(wd / "btok.json"),
              "--batch-size", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_facts"] == len(ANIMALS)

    # 5a. full dense retrieval
    cli_main(["retrieve", "--config", str(wd / "retriever_cfg.json"),
              "--model-path", retr_ckpt, "--index", str(wd / "index"),
              "--corpus", str(wd / "corpus.json"),
              "--data", str(wd / "eval.json"),
              "--out", str(wd / "eval_retrieved.json"),
              "--tokenizer", str(wd / "btok.json"), "--n-docs", "4"])
    retrieved = json.loads((wd / "eval_retrieved.json").read_text())
    assert all(len(ex["fact"]) == 4 for ex in retrieved)
    assert all("score" in ex["fact"][0] for ex in retrieved)

    # 5a'. --index-method fast must agree with exact on CPU (both f32 here;
    # the knob's TPU recall tradeoff is measured in scripts/bench_retrieval)
    cli_main(["retrieve", "--config", str(wd / "retriever_cfg.json"),
              "--model-path", retr_ckpt, "--index", str(wd / "index"),
              "--corpus", str(wd / "corpus.json"),
              "--data", str(wd / "eval.json"),
              "--out", str(wd / "eval_retrieved_fast.json"),
              "--tokenizer", str(wd / "btok.json"), "--n-docs", "4",
              "--index-method", "fast"])
    fast = json.loads((wd / "eval_retrieved_fast.json").read_text())
    assert [[f["id"] for f in ex["fact"]] for ex in fast] == \
        [[f["id"] for f in ex["fact"]] for ex in retrieved]

    # 5a''. --index-method pq: reference IndexPQ role (src/index.py:22-25).
    # Trains + caches codes under <index>/pq on first use; at this tiny scale
    # (dsub=1, 256 centroids) quantization is near-lossless so the retrieved
    # sets must match exact. Then drive the pq output through rerank + hit@k.
    cli_main(["retrieve", "--config", str(wd / "retriever_cfg.json"),
              "--model-path", retr_ckpt, "--index", str(wd / "index"),
              "--corpus", str(wd / "corpus.json"),
              "--data", str(wd / "eval.json"),
              "--out", str(wd / "eval_retrieved_pq.json"),
              "--tokenizer", str(wd / "btok.json"), "--n-docs", "4",
              "--index-method", "pq"])
    assert (wd / "index" / "pq" / "meta.json").exists()
    pq_out = json.loads((wd / "eval_retrieved_pq.json").read_text())
    assert [sorted(f["id"] for f in ex["fact"]) for ex in pq_out] == \
        [sorted(f["id"] for f in ex["fact"]) for ex in retrieved]
    # second run must reuse the cached codes (no retrain) and be deterministic
    cli_main(["retrieve", "--config", str(wd / "retriever_cfg.json"),
              "--model-path", retr_ckpt, "--index", str(wd / "index"),
              "--corpus", str(wd / "corpus.json"),
              "--data", str(wd / "eval.json"),
              "--out", str(wd / "eval_retrieved_pq2.json"),
              "--tokenizer", str(wd / "btok.json"), "--n-docs", "4",
              "--index-method", "pq"])
    assert json.loads((wd / "eval_retrieved_pq2.json").read_text()) == pq_out
    cli_main(["retrieve", "--small-range",
              "--config", str(wd / "retriever_cfg.json"),
              "--model-path", retr_ckpt, "--index", str(wd / "index"),
              "--corpus", str(wd / "corpus.json"),
              "--data", str(wd / "eval_retrieved_pq.json"),
              "--out", str(wd / "eval_reranked_pq.json"),
              "--tokenizer", str(wd / "btok.json")])
    cli_main(["eval-facts", "--data", str(wd / "eval_reranked_pq.json"),
              "--hitk", "1", "2", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "include" in out and "stem" in out

    # 5b. small-range re-rank
    cli_main(["retrieve", "--small-range",
              "--config", str(wd / "retriever_cfg.json"),
              "--model-path", retr_ckpt, "--index", str(wd / "index"),
              "--corpus", str(wd / "corpus.json"),
              "--data", str(wd / "eval.json"),
              "--out", str(wd / "eval_reranked.json"),
              "--tokenizer", str(wd / "btok.json")])
    reranked = json.loads((wd / "eval_reranked.json").read_text())
    for ex in reranked:
        scores = [f["score"] for f in ex["fact"]]
        assert scores == sorted(scores, reverse=True)

    # 6. retrieval quality
    cli_main(["eval-facts", "--data", str(wd / "eval_reranked.json"),
              "--hitk", "1", "2", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"include", "stem"}
    assert 0.0 <= out["include"]["3"] <= 1.0 or 0.0 <= out["include"][3] <= 1.0


def test_mine_candidates_cli(workdir, capsys):
    wd = workdir
    triples = [[a, "says#rel", s] for a, s in zip(ANIMALS, SOUNDS)]
    (wd / "triples.json").write_text(json.dumps(triples))
    (wd / "templates.json").write_text(json.dumps({"says#rel": "says"}))
    rows = [{"sent": f"what sound does the {ANIMALS[0]} make?",
             "label": {SOUNDS[0]: 1.0}, "img_id": "img0"}]
    (wd / "cache_rows.json").write_text(json.dumps(rows))
    (wd / "captions.json").write_text(json.dumps(
        {"img0": [{"caption": f"a {ANIMALS[0]} on the grass"}]}))

    cli_main(["mine-candidates", "--triples", str(wd / "triples.json"),
              "--templates", str(wd / "templates.json"),
              "--data", str(wd / "cache_rows.json"),
              "--captions", str(wd / "captions.json"),
              "--out", str(wd / "mined.json"),
              "--corpus-out", str(wd / "mined_corpus.json"), "--k", "5"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["examples"] == 1
    mined = json.loads((wd / "mined.json").read_text())
    assert mined[0]["fact"][0]["sentence"] == f"{ANIMALS[0]} says {SOUNDS[0]}."
    corpus = json.loads((wd / "mined_corpus.json").read_text())
    assert len(corpus) == len(ANIMALS)


def test_prep_answers_cli(workdir, capsys):
    wd = workdir
    annotations = [{
        "question_id": i, "image_id": f"im{i}", "answer_type": "other",
        "question_type": "what",
        "answers": [{"answer": "cat"}] * 4 + [{"answer": "dog"}],
        "multiple_choice_answer": "cat",
    } for i in range(3)]
    questions = [{"question_id": i, "question": f"q{i}?"} for i in range(3)]
    (wd / "annotations.json").write_text(json.dumps(annotations))
    (wd / "questions.json").write_text(json.dumps(questions))
    cli_main(["prep-answers", "--annotations", str(wd / "annotations.json"),
              "--questions", str(wd / "questions.json"),
              "--dataset", "okvqa", "--min-occurence", "2",
              "--out-dir", str(wd / "prep")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["answers"] == 2  # cat, dog
    targets = json.loads((wd / "prep" / "train.json").read_text())
    assert targets[0]["label"]["cat"] == 1.0
    assert targets[0]["label"]["dog"] == 0.3


def test_prep_questions_cli(workdir, capsys):
    wd = workdir
    questions = [{"question_id": i, "question": f"what is thing {i}?"}
                 for i in range(5)]
    (wd / "qs.json").write_text(json.dumps(questions))
    (wd / "glove.txt").write_text("what 1.0 0.0\nthing 0.0 1.0\n")
    cli_main(["prep-questions", "--questions", str(wd / "qs.json"),
              "--glove", str(wd / "glove.txt"),
              "--out-dir", str(wd / "qprep")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["questions"] == 5
    assert out["glove_matrix"][1] == 2
    assert (wd / "qprep" / "id2question.json").exists()
    assert (wd / "qprep" / "qs_dictionary.pkl").exists()


@pytest.mark.slow
def test_warm_start_reader_cli(tmp_path, capsys):
    """The VQA2.0-pretrain -> OKVQA-retrain flow (run_okvqa_train.sh
    --model_path): second training warm-starts from the first's checkpoint."""
    wd = tmp_path
    (wd / "train.json").write_text(json.dumps(make_examples(16, 2, 0)))
    (wd / "eval.json").write_text(json.dumps(make_examples(8, 2, 5)))
    t5_cfg = {"vocab_size": 64, "d_model": 32, "d_kv": 8, "d_ff": 64,
              "num_layers": 1, "num_decoder_layers": 1, "num_heads": 2,
              "relative_attention_num_buckets": 8, "dropout_rate": 0.0}
    cfg = {"checkpoint_dir": str(wd / "ck"), "name": "pre",
           "per_device_batch_size": 1, "eval_batch_size": 8, "epochs": 2,
           "early_stop": 99, "eval_max_length": 4, "use_remat": False,
           "dtype": "float32",
           "data": {"n_context": 2, "text_maxlength": 20, "answer_maxlength": 4,
                    "stream": 2},
           "optim": {"optim": "adamw", "lr": 5e-3, "weight_decay": 0.0}}
    (wd / "t5.json").write_text(json.dumps(t5_cfg))
    (wd / "cfg.json").write_text(json.dumps(cfg))
    cli_main(["build-tokenizer", "--from-json", str(wd / "train.json"),
              "--out", str(wd / "tok.json")])
    cli_main(["train-reader", "--config", str(wd / "cfg.json"),
              "--t5-config", str(wd / "t5.json"),
              "--train-data", str(wd / "train.json"),
              "--eval-data", str(wd / "eval.json"),
              "--tokenizer", str(wd / "tok.json")])
    capsys.readouterr()
    cfg2 = dict(cfg, name="retrain")
    (wd / "cfg2.json").write_text(json.dumps(cfg2))
    cli_main(["train-reader", "--config", str(wd / "cfg2.json"),
              "--t5-config", str(wd / "t5.json"),
              "--train-data", str(wd / "train.json"),
              "--eval-data", str(wd / "eval.json"),
              "--tokenizer", str(wd / "tok.json"),
              "--model-path", str(wd / "ck" / "pre" / "checkpoint" / "last")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["steps"] == 4  # fresh optimizer (reset_params warm start)
    assert (wd / "ck" / "retrain" / "checkpoint" / "last").exists()


@pytest.mark.slow
def test_retrieve_sharded_matches_plain(workdir, capsys):
    wd = workdir
    if not (wd / "index").exists():
        pytest.skip("depends on test_full_pipeline_stages artifacts")
    import os
    retr_ckpt = str(wd / "ckpt" / "retriever" / "checkpoint" / "best_dev")
    common = ["--config", str(wd / "retriever_cfg.json"),
              "--model-path", retr_ckpt, "--index", str(wd / "index"),
              "--corpus", str(wd / "corpus.json"),
              "--data", str(wd / "eval.json"),
              "--tokenizer", str(wd / "btok.json"), "--n-docs", "4"]
    cli_main(["retrieve", *common, "--out", str(wd / "r_plain.json")])
    cli_main(["retrieve", *common, "--sharded-index",
              "--out", str(wd / "r_sharded.json")])
    plain = json.loads((wd / "r_plain.json").read_text())
    sharded = json.loads((wd / "r_sharded.json").read_text())
    for a, b in zip(plain, sharded):
        assert [f["id"] for f in a["fact"]] == [f["id"] for f in b["fact"]]


def test_mine_candidates_dict_triples(tmp_path, capsys):
    """Reference triplestemindex_database format: {"0": [s, r, o], ...}."""
    wd = tmp_path
    triples = {str(i): [a, "says#rel", s]
               for i, (a, s) in enumerate(zip(ANIMALS, SOUNDS))}
    (wd / "triples.json").write_text(json.dumps(triples))
    (wd / "tmpl.json").write_text(json.dumps({"says#rel": "says"}))
    cli_main(["mine-candidates", "--triples", str(wd / "triples.json"),
              "--templates", str(wd / "tmpl.json"),
              "--corpus-out", str(wd / "corpus.json")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["facts"] == len(ANIMALS)
    corpus = json.loads((wd / "corpus.json").read_text())
    assert corpus[0]["sentence"] == f"{ANIMALS[0]} says {SOUNDS[0]}."


def test_write_results_schema(tmp_path, capsys):
    """--write-results emits the reference result schema
    (test_reader.py:92-105)."""
    wd = tmp_path
    (wd / "train.json").write_text(json.dumps(make_examples(16, 2, 0)))
    (wd / "eval.json").write_text(json.dumps(make_examples(4, 2, 3)))
    t5_cfg = {"vocab_size": 64, "d_model": 32, "d_kv": 8, "d_ff": 64,
              "num_layers": 1, "num_decoder_layers": 1, "num_heads": 2,
              "relative_attention_num_buckets": 8, "dropout_rate": 0.0}
    cfg = {"checkpoint_dir": str(wd / "ck"), "name": "w",
           "per_device_batch_size": 1, "eval_batch_size": 4, "epochs": 1,
           "early_stop": 1, "eval_max_length": 4, "use_remat": False,
           "dtype": "float32",
           "data": {"n_context": 2, "text_maxlength": 20, "answer_maxlength": 4,
                    "stream": 2},
           "optim": {"optim": "adamw", "lr": 1e-3, "weight_decay": 0.0}}
    (wd / "t5.json").write_text(json.dumps(t5_cfg))
    (wd / "cfg.json").write_text(json.dumps(cfg))
    cli_main(["build-tokenizer", "--from-json", str(wd / "train.json"),
              "--out", str(wd / "tok.json")])
    cli_main(["train-reader", "--config", str(wd / "cfg.json"),
              "--t5-config", str(wd / "t5.json"),
              "--train-data", str(wd / "train.json"),
              "--eval-data", str(wd / "eval.json"),
              "--tokenizer", str(wd / "tok.json")])
    cli_main(["eval-reader", "--config", str(wd / "cfg.json"),
              "--t5-config", str(wd / "t5.json"),
              "--eval-data", str(wd / "eval.json"),
              "--model-path", str(wd / "ck" / "w" / "checkpoint" / "last"),
              "--tokenizer", str(wd / "tok.json"),
              "--write-results", str(wd / "results.json")])
    results = json.loads((wd / "results.json").read_text())
    assert len(results) == 4
    row = results[0]
    for key in ("question", "img_id", "answer", "target", "real answers",
                "fact", "include_score", "score", "stem_score"):
        assert key in row, key


def test_pq_cache_invalidated_when_embeddings_change(tmp_path):
    """Re-running embed-facts into the same index dir must retrain the PQ
    codes: stale codes silently score queries in the old embedding space
    (stages._load_or_train_pq fingerprints embeddings.npy)."""
    import os

    import numpy as np

    from lako_tpu.pipeline.stages import _load_or_train_pq
    from lako_tpu.retrieval.index import DenseIndex

    rng = np.random.default_rng(3)
    emb1 = rng.normal(size=(64, 8)).astype(np.float32)
    DenseIndex(emb1).save(str(tmp_path))
    pq1 = _load_or_train_pq(str(tmp_path), n_subquantizers=2, n_bits=4)

    # cached reuse: same embeddings -> identical codes object on disk
    pq1b = _load_or_train_pq(str(tmp_path), n_subquantizers=2, n_bits=4)
    np.testing.assert_array_equal(pq1.codes, pq1b.codes)

    # new corpus into the SAME dir (the retrain-the-retriever workflow)
    emb2 = rng.normal(size=(80, 8)).astype(np.float32) * 5.0
    DenseIndex(emb2).save(str(tmp_path))
    os.utime(tmp_path / "embeddings.npy")  # ensure the mtime moves
    pq2 = _load_or_train_pq(str(tmp_path), n_subquantizers=2, n_bits=4)
    assert pq2.n == 80, "stale PQ codes reused after embeddings changed"

    # changed quantizer geometry alone must also retrain
    pq3 = _load_or_train_pq(str(tmp_path), n_subquantizers=2, n_bits=5)
    assert pq3.k == 32


def test_pq_cache_robustness(tmp_path):
    """Follow-up hardening: a PQ-only dir (embeddings deleted for the memory
    win) must serve the cache; a byte-identical rewrite must NOT retrain; a
    torn source.json degrades to a retrain instead of crashing."""
    import numpy as np

    from lako_tpu.pipeline.stages import _load_or_train_pq
    from lako_tpu.retrieval.index import DenseIndex

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(64, 8)).astype(np.float32)
    DenseIndex(emb).save(str(tmp_path))
    pq1 = _load_or_train_pq(str(tmp_path), n_subquantizers=2, n_bits=4)

    # byte-identical rewrite (copy semantics): content hash matches -> reuse
    data = (tmp_path / "embeddings.npy").read_bytes()
    (tmp_path / "embeddings.npy").write_bytes(data)
    pq2 = _load_or_train_pq(str(tmp_path), n_subquantizers=2, n_bits=4)
    np.testing.assert_array_equal(pq1.codes, pq2.codes)

    # torn fingerprint: retrain, not crash
    (tmp_path / "pq" / "source.json").write_text('{"size": 12')
    pq3 = _load_or_train_pq(str(tmp_path), n_subquantizers=2, n_bits=4)
    assert pq3.n == 64

    # PQ-only dir: the 31x selling point — cache must still be served
    (tmp_path / "embeddings.npy").unlink()
    pq4 = _load_or_train_pq(str(tmp_path), n_subquantizers=2, n_bits=4)
    assert pq4.n == 64

    # nothing at all: a clear error, not a stat() traceback
    import shutil

    shutil.rmtree(tmp_path / "pq")
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="run embed-facts first"):
        _load_or_train_pq(str(tmp_path), n_subquantizers=2, n_bits=4)
