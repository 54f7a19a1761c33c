"""Full iterative LaKo loop on real OK-VQA rows.

Data: the 1,216 validation rows whose COCO caption predictions ship with the
reference checkout (see real_okvqa_smoke.py). The fact corpus is the set of
real caption sentences; BM25 attaches top-k facts per question (the reference's
candidate-mining role), then the complete loop runs: stream-2 FiD reader
training → greedy decode with cross-attention scores → retriever distillation →
corpus embedding → small-range re-rank → hit@k. From-scratch t5-small (no
pretrained weights exist here), so absolute EM is small — this demonstrates the
whole iterative system on real text on TPU.

Run: python scripts/real_okvqa_full_loop.py [--iterations 1] [--cpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.real_okvqa_smoke import build_examples  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--workdir", default="/tmp/okvqa_full_loop")
    args = ap.parse_args()

    import jax

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        jax.config.update("jax_platforms", "cpu")

    from lako_tpu.core.logging import init_logger
    from lako_tpu.pipeline.cli import main as cli
    from lako_tpu.retrieval.bm25 import BM25Okapi

    init_logger()
    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)

    # --- real examples + caption-sentence fact corpus -----------------------
    examples = build_examples()
    sentences = sorted({c.strip() + ("." if not c.strip().endswith(".") else "")
                        for ex in examples
                        for c in ex["caption"].split(".") if c.strip()})
    corpus = [{"sentence": s, "id": i} for i, s in enumerate(sentences)]
    (wd / "corpus.json").write_text(json.dumps(corpus))
    print(f"examples: {len(examples)}, corpus sentences: {len(corpus)}", flush=True)

    bm25 = BM25Okapi([s.lower().split() for s in sentences])
    t0 = time.time()
    for ex in examples:
        query = (ex["question"] + " " + ex["caption"]).lower() \
            .replace("?", "").replace(".", "").split()
        top = bm25.get_top_n(query, list(range(len(sentences))), n=20)
        ex["fact"] = [{"sentence": sentences[i], "id": int(i)} for i in top]
    print(f"BM25 fact mining: {time.time()-t0:.1f}s", flush=True)

    (wd / "train.json").write_text(json.dumps(examples[:1000]))
    (wd / "eval.json").write_text(json.dumps(examples[1000:]))

    # --- tokenizers + configs ------------------------------------------------
    cli(["build-tokenizer", "--from-json", str(wd / "train.json"),
         str(wd / "corpus.json"), "--out", str(wd / "tok.json")])
    cli(["build-tokenizer", "--from-json", str(wd / "train.json"),
         str(wd / "corpus.json"), "--out", str(wd / "btok.json"),
         "--style", "bert"])

    (wd / "reader.json").write_text(json.dumps({
        "model_size": "small",
        "per_device_batch_size": 32, "eval_batch_size": 32,
        "epochs": args.epochs, "early_stop": args.epochs,
        "eval_max_length": 8, "use_remat": False, "dtype": "bfloat16",
        "data": {"n_context": 3, "text_maxlength": 128, "answer_maxlength": 8,
                 "stream": 2},
        "optim": {"optim": "adamw", "lr": 3e-4, "weight_decay": 0.01}}))
    (wd / "retriever.json").write_text(json.dumps({
        "per_device_batch_size": 16, "eval_batch_size": 16, "epochs": 3,
        "early_stop": 3, "n_context": 3, "dtype": "float32",
        "retriever": {
            "bert": {"vocab_size": 32000, "hidden_size": 128,
                     "num_hidden_layers": 2, "num_attention_heads": 4,
                     "intermediate_size": 256, "max_position_embeddings": 160},
            "indexing_dimension": 64, "question_maxlength": 64,
            "passage_maxlength": 32},
        "optim": {"optim": "adamw", "lr": 1e-4, "weight_decay": 0.01}}))

    t0 = time.time()
    cli(["full-loop", "--workdir", str(wd / "loop"),
         "--reader-config", str(wd / "reader.json"),
         "--retriever-config", str(wd / "retriever.json"),
         "--train-data", str(wd / "train.json"),
         "--eval-data", str(wd / "eval.json"),
         "--corpus", str(wd / "corpus.json"),
         "--tokenizer", str(wd / "tok.json"),
         "--bert-tokenizer", str(wd / "btok.json"),
         "--iterations", str(args.iterations)])
    print(f"full loop wall: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
