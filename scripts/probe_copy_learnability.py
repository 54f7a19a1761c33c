"""Can a from-scratch FiD T5 learn to COPY an answer out of a fact passage?

Root-cause probe for VERDICT r4 item 1: the reference's iterative loop
improves the READER because better-ranked facts land in a reader that
already knows how to read an answer out of a passage (pretrained T5,
/root/reference/train_reader.py:243-250). No pretrained weights exist in
this environment; measured runs (artifacts/full_loop_r4_probe.json /
_oracle.json) show a from-scratch t5-small stays fact-blind for ~10k steps
(copy-pretrain loss plateau ~3.05 ≈ answer-pool entropy).

This script isolates the *capability* question on a synthetic pointer task
where copying is the ONLY strategy that fits:

  question:  "what is the value of item<i>?"
  fact:      "the answer to what is the value of item<i> is <ans>."
  target:    <ans>            (fresh random draw per repeat -> memorizing a
                               question's answer cannot beat pool entropy)
  eval rows use UNSEEN items  (EM > chance  <=>  genuine copying)

Runs the real product path (WordVocabTokenizer -> Collator -> train_reader
via train_reader_stage) at a chosen model size, logging the eval-EM
trajectory so the emergence step-count is measured, not guessed.

Run (CPU, tiny):  python scripts/probe_copy_learnability.py --size tiny --cpu
Run (TPU, small): python scripts/probe_copy_learnability.py --size small \
                      --items 1000 --repeats 8 --epochs 200 --eval-every 10
Output: artifacts/copy_learnability_<size>.json
"""

import argparse
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_rows(items, pool, rng, repeats, n_distractors, all_items):
    rows = []
    for _ in range(repeats):
        for it in items:
            ans = rng.choice(pool)
            q = f"what is the value of {it}?"
            facts = [{"sentence": f"the answer to what is the value of "
                                  f"{it} is {ans}.", "id": 0}]
            for d in range(n_distractors):
                other = rng.choice(all_items)
                facts.append({"sentence": f"the answer to what is the value "
                                          f"of {other} is {rng.choice(pool)}.",
                              "id": d + 1})
            rng.shuffle(facts)
            rows.append({"question": q, "caption": f"a photo of {it}.",
                         "target": ans, "answer": {ans: 1.0},
                         "img_id": it, "fact": facts})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="tiny")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--items", type=int, default=200)
    ap.add_argument("--eval-items", type=int, default=64)
    ap.add_argument("--pool", type=int, default=60)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--distractors", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"

    from lako_tpu.core.config import (OptimConfig, ReaderDataConfig,
                                      ReaderTrainConfig)
    from lako_tpu.core.logging import init_logger
    from lako_tpu.pipeline.stages import train_reader_stage
    from lako_tpu.text.tokenizer import WordVocabTokenizer

    init_logger()
    rng = random.Random(0)
    train_items = [f"item{i}" for i in range(args.items)]
    eval_items = [f"unseen{i}" for i in range(args.eval_items)]
    pool = [f"ans{j}" for j in range(args.pool)]
    all_items = train_items + eval_items

    wd = Path(f"/tmp/copy_probe_{args.size}")
    wd.mkdir(parents=True, exist_ok=True)
    train_rows = make_rows(train_items, pool, rng, args.repeats,
                           args.distractors, all_items)
    eval_rows = make_rows(eval_items, pool, rng, 1, args.distractors,
                          all_items)
    (wd / "train.json").write_text(json.dumps(train_rows))
    (wd / "eval.json").write_text(json.dumps(eval_rows))

    corpus = [r["question"] + " " + r["caption"] + " " +
              " ".join(f["sentence"] for f in r["fact"]) + " " + r["target"]
              for r in train_rows + eval_rows]
    tok = WordVocabTokenizer.build(corpus, style="t5")
    tok.save(str(wd / "tok.json"))

    n_ctx = 1 + args.distractors
    cfg = ReaderTrainConfig(
        model_size=args.size, name=f"copy_{args.size}",
        checkpoint_dir=str(wd), per_device_batch_size=args.batch,
        eval_batch_size=args.batch, epochs=args.epochs,
        early_stop=args.epochs, eval_every=args.eval_every,
        eval_max_length=4, use_remat=False, dtype="bfloat16",
        data=ReaderDataConfig(n_context=n_ctx, text_maxlength=48,
                        answer_maxlength=4, stream=2),
        optim=OptimConfig(optim="adamw", lr=args.lr, weight_decay=0.01),
    )
    t0 = time.time()
    out = train_reader_stage(cfg, str(wd / "train.json"),
                             str(wd / "eval.json"), tok)
    wall = time.time() - t0

    ems = [(h["epoch"], h.get("em")) for h in out["history"]
           if h.get("em") is not None]
    steps_per_epoch = max(1, len(train_rows) // args.batch)
    result = {
        "config": {k: getattr(args, k) for k in
                   ("size", "items", "pool", "repeats", "distractors",
                    "epochs", "lr", "batch")},
        "train_rows": len(train_rows),
        "steps_per_epoch": steps_per_epoch,
        "chance_em": 1.0 / args.pool,
        "best_eval_em": out["best_dev_em"],
        "em_trajectory": [
            {"epoch": e, "step": e * steps_per_epoch, "em": em}
            for e, em in ems],
        "wall_seconds": round(wall, 1),
    }
    print(json.dumps(result, indent=1))
    out_path = args.out or f"artifacts/copy_learnability_{args.size}.json"
    Path(out_path).parent.mkdir(exist_ok=True)
    Path(out_path).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
