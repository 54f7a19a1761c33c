"""Quickstart: the full LaKo pipeline on a synthetic fixture, via the CLI.

Runs every stage end to end on an 8-device virtual CPU mesh in ~3 minutes:
tokenizers -> reader training -> eval with cross-attention scores ->
retriever distillation -> corpus embedding -> (sharded) dense retrieval ->
hit@k. Swap the fixture JSONs for real OKVQA-format data (same schemas as the
reference repo) to run the real thing; drop the platform override to run on
TPU.

    python examples/quickstart.py
"""

import json
import os
import sys
from pathlib import Path

import jax

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
if os.environ.get("QUICKSTART_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from tests.fixtures import corpus_sentences, make_examples  # noqa: E402
from lako_tpu.pipeline.cli import main as cli  # noqa: E402


def main(workdir: str = "/tmp/lako_quickstart"):
    wd = Path(workdir)
    wd.mkdir(parents=True, exist_ok=True)

    # --- data (reference-schema JSON) ---------------------------------------
    (wd / "train.json").write_text(json.dumps(make_examples(48, 3, 0)))
    (wd / "eval.json").write_text(json.dumps(make_examples(12, 3, 9)))
    (wd / "corpus.json").write_text(json.dumps(
        [{"sentence": s, "id": i} for i, s in enumerate(corpus_sentences())]))

    # --- configs -------------------------------------------------------------
    (wd / "t5.json").write_text(json.dumps({
        "vocab_size": 64, "d_model": 64, "d_kv": 16, "d_ff": 128,
        "num_layers": 2, "num_decoder_layers": 2, "num_heads": 4,
        "relative_attention_num_buckets": 8, "dropout_rate": 0.0}))
    (wd / "reader.json").write_text(json.dumps({
        "checkpoint_dir": str(wd / "ck"), "name": "reader",
        "per_device_batch_size": 1, "eval_batch_size": 8, "epochs": 12,
        "early_stop": 12, "eval_max_length": 4, "use_remat": False,
        "dtype": "float32",
        "data": {"n_context": 3, "text_maxlength": 24, "answer_maxlength": 4,
                 "stream": 2},
        "optim": {"optim": "adamw", "lr": 3e-3, "weight_decay": 0.0}}))
    (wd / "retriever.json").write_text(json.dumps({
        "checkpoint_dir": str(wd / "ck"), "name": "retriever",
        "per_device_batch_size": 1, "eval_batch_size": 8, "epochs": 1,
        "early_stop": 1, "n_context": 3, "dtype": "float32",
        "retriever": {
            "bert": {"vocab_size": 200, "hidden_size": 32,
                     "num_hidden_layers": 1, "num_attention_heads": 2,
                     "intermediate_size": 64, "max_position_embeddings": 64},
            "indexing_dimension": 16, "question_maxlength": 16,
            "passage_maxlength": 12},
        "optim": {"optim": "adamw", "lr": 1e-3, "weight_decay": 0.0}}))

    # --- pipeline ------------------------------------------------------------
    cli(["build-tokenizer", "--from-json", str(wd / "train.json"),
         str(wd / "corpus.json"), "--out", str(wd / "tok.json")])
    cli(["build-tokenizer", "--from-json", str(wd / "train.json"),
         str(wd / "corpus.json"), "--out", str(wd / "btok.json"),
         "--style", "bert"])
    cli(["train-reader", "--config", str(wd / "reader.json"),
         "--t5-config", str(wd / "t5.json"),
         "--train-data", str(wd / "train.json"),
         "--eval-data", str(wd / "eval.json"),
         "--tokenizer", str(wd / "tok.json")])
    reader_ckpt = str(wd / "ck" / "reader" / "checkpoint" / "best_dev")
    cli(["eval-reader", "--config", str(wd / "reader.json"),
         "--t5-config", str(wd / "t5.json"),
         "--eval-data", str(wd / "eval.json"), "--model-path", reader_ckpt,
         "--tokenizer", str(wd / "tok.json"),
         "--write-crossattention-scores", str(wd / "scored.json")])
    cli(["train-retriever", "--config", str(wd / "retriever.json"),
         "--train-data", str(wd / "scored.json"),
         "--eval-data", str(wd / "scored.json"),
         "--tokenizer", str(wd / "btok.json")])
    retr_ckpt = str(wd / "ck" / "retriever" / "checkpoint" / "best_dev")
    cli(["embed-facts", "--config", str(wd / "retriever.json"),
         "--model-path", retr_ckpt, "--corpus", str(wd / "corpus.json"),
         "--out", str(wd / "index"), "--tokenizer", str(wd / "btok.json"),
         "--batch-size", "4"])
    cli(["retrieve", "--config", str(wd / "retriever.json"),
         "--model-path", retr_ckpt, "--index", str(wd / "index"),
         "--corpus", str(wd / "corpus.json"),
         "--data", str(wd / "eval.json"),
         "--out", str(wd / "retrieved.json"),
         "--tokenizer", str(wd / "btok.json"), "--n-docs", "4"])
    cli(["eval-facts", "--data", str(wd / "retrieved.json"),
         "--hitk", "1", "2", "4"])
    print(f"quickstart complete — artifacts in {wd}")


if __name__ == "__main__":
    main()
