"""Full iterative pipeline: two reader<->retriever iterations over the fixture
through the CLI orchestrator."""

import json

import numpy as np
import pytest

from lako_tpu.pipeline.cli import main as cli_main
from tests.fixtures import corpus_sentences, make_examples


@pytest.mark.slow
def test_full_loop_two_iterations(tmp_path, capsys):
    wd = tmp_path
    (wd / "train.json").write_text(json.dumps(make_examples(32, 3, 0)))
    (wd / "eval.json").write_text(json.dumps(make_examples(8, 3, 77)))
    corpus = [{"sentence": s, "id": i} for i, s in enumerate(corpus_sentences())]
    (wd / "corpus.json").write_text(json.dumps(corpus))

    t5_cfg = {"vocab_size": 64, "d_model": 64, "d_kv": 16, "d_ff": 128,
              "num_layers": 2, "num_decoder_layers": 2, "num_heads": 4,
              "relative_attention_num_buckets": 8, "dropout_rate": 0.0}
    reader_cfg = {
        "per_device_batch_size": 1, "eval_batch_size": 8, "epochs": 8,
        "early_stop": 8, "eval_max_length": 4, "use_remat": False,
        "dtype": "float32",
        "data": {"n_context": 3, "text_maxlength": 24, "answer_maxlength": 4,
                 "stream": 2},
        # lr tuned for the HF-parity AdamW (correct_bias=False) dynamics
        "optim": {"optim": "adamw", "lr": 3e-3, "weight_decay": 0.0},
    }
    retriever_cfg = {
        "per_device_batch_size": 1, "eval_batch_size": 8, "epochs": 1,
        "early_stop": 1, "n_context": 3, "dtype": "float32",
        "retriever": {
            "bert": {"vocab_size": 200, "hidden_size": 32,
                     "num_hidden_layers": 1, "num_attention_heads": 2,
                     "intermediate_size": 64, "max_position_embeddings": 64},
            "indexing_dimension": 16, "question_maxlength": 16,
            "passage_maxlength": 12,
        },
        "optim": {"optim": "adamw", "lr": 1e-3, "weight_decay": 0.0},
    }
    (wd / "t5.json").write_text(json.dumps(t5_cfg))
    (wd / "reader.json").write_text(json.dumps(reader_cfg))
    (wd / "retr.json").write_text(json.dumps(retriever_cfg))

    cli_main(["build-tokenizer", "--from-json", str(wd / "train.json"),
              str(wd / "corpus.json"), "--out", str(wd / "tok.json")])
    cli_main(["build-tokenizer", "--from-json", str(wd / "train.json"),
              str(wd / "corpus.json"), "--out", str(wd / "btok.json"),
              "--style", "bert"])
    capsys.readouterr()

    cli_main([
        "full-loop", "--workdir", str(wd / "loop"),
        "--reader-config", str(wd / "reader.json"),
        "--retriever-config", str(wd / "retr.json"),
        "--t5-config", str(wd / "t5.json"),
        "--train-data", str(wd / "train.json"),
        "--eval-data", str(wd / "eval.json"),
        "--corpus", str(wd / "corpus.json"),
        "--tokenizer", str(wd / "tok.json"),
        "--bert-tokenizer", str(wd / "btok.json"),
        "--iterations", "2", "--fact-ablation",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["iterations"] == 2
    hist = out["history"]
    assert hist[0]["reader_best_em"] > 0.3
    # --- per-iteration diagnostics (round-4: cross-iteration claims must be
    # checkable from the artifact) ---
    d1, d2 = hist[0]["diagnostics"], hist[1]["diagnostics"]
    # two independently trained readers are distinct checkpoints
    assert d1["reader_ckpt_sha256"] and d2["reader_ckpt_sha256"]
    assert d1["reader_ckpt_sha256"] != d2["reader_ckpt_sha256"]
    # hit-conditioned slices cover the whole eval set
    hc = d1["hit_conditioned"]
    assert hc["n_hit"] + hc["n_miss"] == hist[0]["eval"]["total"]
    # iteration 2 only: train-input diff + answer drift + fixed-gold retriever
    assert "train_fact_diff_vs_prev" not in d1
    fd = d2["train_fact_diff_vs_prev"]
    assert 0.0 <= fd["mean_topn_jaccard"] <= 1.0
    assert "answers_vs_prev" in d2
    for d in (d1, d2):
        assert "retriever_inversions_vs_v1_gold" in d
        # fact-shuffle ablation ran and produced a well-formed delta. (No
        # sign assertion: the fixture's questions NAME the animal, so a
        # trained reader answers from the question alone and is legitimately
        # fact-blind here — exactly what the diagnostic exists to expose.)
        ab = d["fact_shuffle_ablation"]
        assert 0.0 <= ab["em"] <= 1.0
        assert isinstance(ab["em_delta_vs_true_facts"], float)
    # artifacts from every stage of both iterations exist
    loop = wd / "loop"
    for v in ("v1", "v2"):
        assert (loop / f"train_scored_{v}.json").exists()
        assert (loop / f"eval_reranked_{v}.json").exists()
        assert (loop / f"fact_index_{v}" / "embeddings.npy").exists()
        assert (loop / f"reader_{v}" / "checkpoint" / "best_dev").exists()
    assert (loop / "full_loop_history.json").exists()
    # iteration 2's reader consumed iteration 1's re-ranked data
    reranked = json.loads((loop / "train_reranked_v1.json").read_text())
    scores = [f["score"] for f in reranked[0]["fact"]]
    assert scores == sorted(scores, reverse=True)


@pytest.mark.slow
def test_full_loop_warm_start(tmp_path, capsys):
    """--warm-start-reader: iteration 2's reader initializes from iteration 1's
    best checkpoint (reference load_path warm start)."""
    wd = tmp_path
    (wd / "train.json").write_text(json.dumps(make_examples(16, 2, 0)))
    (wd / "eval.json").write_text(json.dumps(make_examples(8, 2, 7)))
    corpus = [{"sentence": s, "id": i} for i, s in enumerate(corpus_sentences())]
    (wd / "corpus.json").write_text(json.dumps(corpus))
    t5_cfg = {"vocab_size": 64, "d_model": 32, "d_kv": 8, "d_ff": 64,
              "num_layers": 1, "num_decoder_layers": 1, "num_heads": 2,
              "relative_attention_num_buckets": 8, "dropout_rate": 0.0}
    reader_cfg = {"per_device_batch_size": 1, "eval_batch_size": 8, "epochs": 2,
                  "early_stop": 2, "eval_max_length": 4, "use_remat": False,
                  "dtype": "float32",
                  "data": {"n_context": 2, "text_maxlength": 20,
                           "answer_maxlength": 4, "stream": 2},
                  "optim": {"optim": "adamw", "lr": 5e-3, "weight_decay": 0.0}}
    retr_cfg = {"per_device_batch_size": 1, "eval_batch_size": 8, "epochs": 1,
                "early_stop": 1, "n_context": 2, "dtype": "float32",
                "retriever": {"bert": {"vocab_size": 200, "hidden_size": 32,
                                       "num_hidden_layers": 1,
                                       "num_attention_heads": 2,
                                       "intermediate_size": 64,
                                       "max_position_embeddings": 64},
                              "indexing_dimension": 16, "question_maxlength": 16,
                              "passage_maxlength": 12},
                "optim": {"optim": "adamw", "lr": 1e-3, "weight_decay": 0.0}}
    for n, o in (("t5", t5_cfg), ("reader", reader_cfg), ("retr", retr_cfg)):
        (wd / f"{n}.json").write_text(json.dumps(o))
    cli_main(["build-tokenizer", "--from-json", str(wd / "train.json"),
              str(wd / "corpus.json"), "--out", str(wd / "tok.json")])
    cli_main(["build-tokenizer", "--from-json", str(wd / "train.json"),
              str(wd / "corpus.json"), "--out", str(wd / "btok.json"),
              "--style", "bert"])
    capsys.readouterr()
    cli_main(["full-loop", "--workdir", str(wd / "loop"),
              "--reader-config", str(wd / "reader.json"),
              "--retriever-config", str(wd / "retr.json"),
              "--t5-config", str(wd / "t5.json"),
              "--train-data", str(wd / "train.json"),
              "--eval-data", str(wd / "eval.json"),
              "--corpus", str(wd / "corpus.json"),
              "--tokenizer", str(wd / "tok.json"),
              "--bert-tokenizer", str(wd / "btok.json"),
              "--iterations", "2", "--warm-start-reader"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["iterations"] == 2
    assert (wd / "loop" / "reader_v2" / "checkpoint").exists()
