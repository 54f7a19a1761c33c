"""Copy-skill transfer curriculum (VERDICT r4 #3).

Round 4 established two endpoints: the product path learns pointer-copying
in ~500 steps on clean synthetic data (artifacts/copy_learnability_tiny.json)
but that skill transfers 0.0 to real OK-VQA text after 10k steps
(artifacts/full_loop_r4_trainqa.json). This script builds the intermediate
rungs and measures, after each, the reader's fact-shuffle EM delta on REAL
OK-VQA eval rows — the curve that locates exactly where transfer breaks.

Rungs (same real questions/captions/BM25 candidates throughout; each trains
the SAME reader onward — a curriculum, not independent runs):

  A template-plant   target = random answer, planted as a fixed-template QA
                     fact ("the answer to <q> is <a>.") in a random slot.
                     (= the r4 --copy-pretrain recipe; measured transfer 0.)
  B paraphrase-plant same, but the planted fact uses one of five templates —
                     breaks the single-template cue.
  C caption-plant    random answer inserted at a random word boundary INSIDE
                     a real candidate sentence — no template at all; the only
                     signal is "an answer-vocab word sits in a fact".
  D real-oracle      true targets, facts oracle-ordered (answer-bearing
                     first) — the r4 recipe that produced the only nonzero
                     shuffle delta (1.2 pts at 600 epochs).

After every rung: EM on that rung's held-out planted rows (did the rung's
own skill emerge?) + EM and fact-shuffle delta on the REAL eval rows with
true candidates (did it transfer?).

Run (TPU): python scripts/curriculum_copy_transfer.py
           [--epochs-per-rung 150] [--rungs ABCD] [--out artifacts/...]
"""

import argparse
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.real_okvqa_smoke import build_examples  # noqa: E402

TEMPLATES = [
    "the answer to {q} is {a}.",
    "{q} the answer is {a}.",
    "when asked {q} people answer {a}.",
    "{a} is the answer to {q}.",
    "question: {q} answer: {a}.",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-per-rung", type=int, default=150)
    ap.add_argument("--rungs", default="ABCD")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--model-size", default="small")
    ap.add_argument("--n-context", type=int, default=3)
    ap.add_argument("--n-candidates", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=8,
                    help="planted variants per train question per rung")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--workdir", default="/tmp/okvqa_curriculum")
    ap.add_argument("--out", default="artifacts/curriculum_copy_transfer.json")
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

    # --- real rows + candidates (identical prep to real_okvqa_full_loop) ----
    examples = build_examples()
    n_train = 1000
    sentences = sorted({c.strip() + ("." if not c.strip().endswith(".") else "")
                        for ex in examples
                        for c in ex["caption"].split(".") if c.strip()})
    qa_facts = [f"the answer to {ex['question'].rstrip('?').strip()} "
                f"is {ex['target']}."
                for ex in examples[:n_train]]
    sentences = sorted(set(sentences) | set(qa_facts))
    corpus = [{"sentence": s, "id": i} for i, s in enumerate(sentences)]
    bm25 = BM25Okapi([s.lower().split() for s in sentences])
    for ex in examples:
        query = (ex["question"] + " " + ex["caption"]).lower() \
            .replace("?", "").replace(".", "").split()
        top = bm25.get_top_n(query, list(range(len(sentences))),
                             n=args.n_candidates)
        ex["fact"] = [{"sentence": sentences[i], "id": int(i)} for i in top]
    train, evald = examples[:n_train], examples[n_train:]
    pool = sorted({ex["target"] for ex in train})
    rng = random.Random(0)

    (wd / "eval_real.json").write_text(json.dumps(evald))
    rotated = [dict(ex, fact=evald[(i + 1) % len(evald)]["fact"])
               for i, ex in enumerate(evald)]
    (wd / "eval_real_shuffled.json").write_text(json.dumps(rotated))
    # tokenizer must cover every rung's text: build from train + corpus +
    # all templates with a sample answer (template words must be in-vocab)
    (wd / "train_real.json").write_text(json.dumps(train))
    (wd / "corpus.json").write_text(json.dumps(corpus))
    tpl_rows = [{"sentence": t.format(q="what is this", a=pool[0]), "id": i}
                for i, t in enumerate(TEMPLATES)]
    (wd / "templates.json").write_text(json.dumps(tpl_rows))
    cli(["build-tokenizer", "--from-json", str(wd / "train_real.json"),
         str(wd / "corpus.json"), str(wd / "templates.json"),
         "--out", str(wd / "tok.json")])

    def plant_rows(rows, repeats, mode):
        out = []
        for r in range(repeats):
            for ex in rows:
                ans = rng.choice(pool)
                facts = [dict(f) for f in ex["fact"][:args.n_context]]
                slot = rng.randrange(max(1, len(facts)))
                q = ex["question"].rstrip("?").strip()
                if mode == "A":
                    sent = TEMPLATES[0].format(q=q, a=ans)
                elif mode == "B":
                    sent = rng.choice(TEMPLATES).format(q=q, a=ans)
                elif mode == "C":
                    base = (facts[slot]["sentence"] if facts
                            else ex["caption"].split(".")[0] + ".")
                    words = base.rstrip(".").split()
                    pos = rng.randrange(len(words) + 1)
                    sent = " ".join(words[:pos] + [ans] + words[pos:]) + "."
                else:
                    raise ValueError(mode)
                qa = {"sentence": sent, "id": 10 ** 6 + len(out)}
                if facts:
                    facts[slot] = qa
                else:
                    facts = [qa]
                out.append({"question": ex["question"],
                            "caption": ex["caption"], "target": ans,
                            "answer": {ans: 1.0},
                            "img_id": ex["img_id"], "fact": facts})
        return out

    def oracle_rows(rows):
        from lako_tpu.retrieval.eval import answer_bearing_first

        return answer_bearing_first(rows)[0]

    def reader_cfg(name, epochs, ckpt_root):
        return {
            "model_size": args.model_size, "name": name,
            "checkpoint_dir": str(ckpt_root),
            "per_device_batch_size": 32, "eval_batch_size": 32,
            "epochs": epochs, "early_stop": epochs,
            "eval_every": max(1, epochs // 5),
            "eval_max_length": 8, "use_remat": False, "dtype": "bfloat16",
            "data": {"n_context": args.n_context, "text_maxlength": 128,
                     "answer_maxlength": 8, "stream": 2},
            "optim": {"optim": "adamw", "lr": args.lr, "weight_decay": 0.01}}

    def eval_real(ckpt, tag):
        """EM on real eval rows (true facts) and on the rotated-facts copy —
        the transfer measurement after each rung."""
        outs = {}
        for k, data in (("true", "eval_real.json"),
                        ("shuffled", "eval_real_shuffled.json")):
            res = wd / f"results_{tag}_{k}.json"
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                cli(["eval-reader", "--config", str(wd / "cfg_eval.json"),
                     "--eval-data", str(wd / data), "--model-path", ckpt,
                     "--tokenizer", str(wd / "tok.json"),
                     "--write-results", str(res)])
            outs[k] = json.loads(buf.getvalue().strip().splitlines()[-1])
        return {"em_true": outs["true"]["em"],
                "em_shuffled": outs["shuffled"]["em"],
                "include_true": outs["true"]["include_em"],
                "include_shuffled": outs["shuffled"]["include_em"],
                "shuffle_delta_em": outs["true"]["em"]
                - outs["shuffled"]["em"]}

    (wd / "cfg_eval.json").write_text(json.dumps(
        reader_cfg("evalonly", 1, wd / "evalonly")))

    history = []
    prev_ckpt = None
    t_start = time.time()
    for rung in args.rungs:
        t0 = time.time()
        if rung in "ABC":
            tr = plant_rows(train, args.repeats, rung)
            ev = plant_rows(evald, 1, rung)
        elif rung == "D":
            tr, ev = oracle_rows(train), oracle_rows(evald)
        else:
            raise SystemExit(f"unknown rung {rung!r}")
        (wd / f"train_{rung}.json").write_text(json.dumps(tr))
        (wd / f"eval_{rung}.json").write_text(json.dumps(ev))
        cfg_path = wd / f"cfg_{rung}.json"
        cfg_path.write_text(json.dumps(reader_cfg(
            f"reader_{rung}", args.epochs_per_rung, wd / f"run_{rung}")))
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            cli(["train-reader", "--config", str(cfg_path),
                 "--train-data", str(wd / f"train_{rung}.json"),
                 "--eval-data", str(wd / f"eval_{rung}.json"),
                 "--tokenizer", str(wd / "tok.json")] +
                (["--model-path", prev_ckpt] if prev_ckpt else []))
        rung_metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
        best = wd / f"run_{rung}" / f"reader_{rung}" / "checkpoint" / "best_dev"
        last = wd / f"run_{rung}" / f"reader_{rung}" / "checkpoint" / "last"
        prev_ckpt = str(best if best.exists() else last)
        row = {"rung": rung,
               "rung_task_em": rung_metrics.get("best_dev_em"),
               "wall_s": round(time.time() - t0, 1),
               "transfer": eval_real(prev_ckpt, rung)}
        history.append(row)
        print(json.dumps(row), flush=True)

    out = {"config": vars(args), "n_train": n_train, "n_eval": len(evald),
           "corpus_size": len(corpus),
           "wall_seconds": round(time.time() - t_start, 1),
           "history": history}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
