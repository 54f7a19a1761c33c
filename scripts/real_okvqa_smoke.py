"""Real-data smoke: train a from-scratch t5-small FiD reader on genuine OK-VQA
rows (reference cache format) with real COCO caption predictions.

Uses the artifacts shipped inside the reference checkout (cache/1/valid.json +
pred.coco_caption.{val,test}.json — the only splits whose captions are present;
see SURVEY.md §7 data caveat), intersected to the 1,216 examples with captions,
split 1000 train / rest eval. Runs the reference's ``--use_fact no`` reader
configuration (question+caption only). With no pretrained T5 weights available
in this environment the absolute EM is expectedly low — the point is exercising
the full real-data path (cache rows → soft labels → target selection →
tokenizer → fixed-shape batches → SPMD train → greedy decode → weighted EM).

Run: python scripts/real_okvqa_smoke.py [--epochs 8] [--cpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REFERENCE = Path("/root/reference/data_process/data")


def build_examples():
    rows = json.loads((REFERENCE / "okvqa/cache/1/valid.json").read_text())
    caps = {}
    for f in ("pred.coco_caption.val.json", "pred.coco_caption.test.json"):
        for r in json.loads((REFERENCE / "caption" / f).read_text()):
            caps.setdefault(str(r["image_id"]), []).append(r["caption"])
    examples = []
    for r in rows:
        img = str(r["img_id"])
        if img not in caps or not r["label"]:
            continue
        target = max(r["label"].items(), key=lambda kv: kv[1])[0]
        examples.append({
            "question": r["sent"],
            "target": target,
            "answer": {k: float(v) for k, v in r["label"].items()},
            "img_id": r["img_id"],
            "caption": " ".join(c if c.endswith(".") else c + "."
                                for c in caps[img]),
            "fact": [],
        })
    return examples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=2)  # per device
    args = ap.parse_args()

    import jax

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from lako_tpu.core.config import (
        OptimConfig,
        ReaderDataConfig,
        ReaderTrainConfig,
        t5_config_for_size,
    )
    from lako_tpu.core.logging import init_logger
    from lako_tpu.text.tokenizer import WordVocabTokenizer
    from lako_tpu.train.reader import train_reader

    init_logger()
    examples = build_examples()
    train, evald = examples[:1000], examples[1000:]
    print(f"real OKVQA rows with captions: {len(examples)} "
          f"(train {len(train)}, eval {len(evald)})")

    corpus = [e["question"] for e in examples] + [e["caption"] for e in examples]
    corpus += [a for e in examples for a in e["answer"]]
    corpus += ["question: context: fact:"]
    tok = WordVocabTokenizer.build(corpus, max_vocab=16000)
    print("vocab:", tok.vocab_size)

    t5_cfg = t5_config_for_size("small", vocab_size=tok.vocab_size,
                                dropout_rate=0.1)
    cfg = ReaderTrainConfig(
        model_size="small",
        per_device_batch_size=args.batch,
        eval_batch_size=32,
        epochs=args.epochs,
        early_stop=args.epochs,
        eval_max_length=8,
        use_remat=False,
        dtype="bfloat16",
        data=ReaderDataConfig(n_context=0, text_maxlength=128,
                              answer_maxlength=8, stream=1, use_fact=False),
        optim=OptimConfig(optim="adamw", lr=3e-4, weight_decay=0.01),
        checkpoint_dir="/tmp/okvqa_smoke",
        name="t5small_nofact",
    )
    t0 = time.time()
    result = train_reader(cfg, train, evald, tok, t5_config=t5_cfg)
    out = {
        "examples": len(examples),
        "best_dev_em": result.best_dev_em,
        "epochs": result.epochs_run,
        "history": [{k: round(v, 4) for k, v in h.items()} for h in result.history],
        "wall_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
