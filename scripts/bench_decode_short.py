"""Chunked early-exit decode on REAL trained answers (VERDICT r2 #2).

Trains (or reuses) the from-scratch t5-small FiD reader on the genuine
OK-VQA rows + COCO captions that ship with the reference checkout
(scripts/real_okvqa_smoke.py), whose decoded answers genuinely hit EOS in
1-5 tokens — the reference answer-length regime (test_reader.py:65-69 decodes
max_length 50 but VQA answers are a few tokens). Then decodes the eval split
through the stacked engine with a chunk_size sweep and prints measured ans/s
per setting plus the real answer-length histogram.

This is the real-EOS companion to bench.py's driver-captured
``decode_short_answers_per_sec`` (which forces EOS at token 4 at the
reference t5-large shape so the number is reproducible without a trained
checkpoint): here nothing is forced — termination comes from the trained
model's own EOS behavior.

Run: python scripts/bench_decode_short.py [--epochs 12] [--cpu]
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
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--workdir", default="/tmp/okvqa_decode_short")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--max-length", type=int, default=50)
    args = ap.parse_args()

    import jax

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jax.numpy as jnp

    from lako_tpu.core.checkpoint import load_checkpoint
    from lako_tpu.core.config import ReaderTrainConfig, t5_config_for_size
    from lako_tpu.core.logging import init_logger
    from lako_tpu.data import ReaderCollator, ReaderDataset, batch_iterator
    from lako_tpu.models.t5 import FiDT5
    from lako_tpu.models.t5.engine import DecodeEngine
    from lako_tpu.train.reader import train_reader

    init_logger()
    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)

    examples = build_examples()
    train_ex, eval_ex = examples[:1000], examples[1000:]
    tok_path = wd / "tok.json"
    if not tok_path.exists():
        (wd / "all.json").write_text(json.dumps(examples))
        from lako_tpu.pipeline.cli import main as cli

        cli(["build-tokenizer", "--from-json", str(wd / "all.json"),
             "--out", str(tok_path)])
    from lako_tpu.text.tokenizer import load_tokenizer

    tokenizer = load_tokenizer(str(tok_path))

    cfg = ReaderTrainConfig.from_dict({
        "model_size": "small",
        "per_device_batch_size": 32, "eval_batch_size": 32,
        "epochs": args.epochs, "early_stop": args.epochs,
        "eval_max_length": 8, "use_remat": False, "dtype": "bfloat16",
        "data": {"n_context": 1, "text_maxlength": 128, "answer_maxlength": 8,
                 "stream": 2},
        "optim": {"optim": "adamw", "lr": 3e-4, "weight_decay": 0.01},
        "checkpoint_dir": str(wd), "name": "reader"})
    t5_cfg = t5_config_for_size("small", vocab_size=tokenizer.vocab_size,
                                dropout_rate=0.0)
    model = FiDT5(t5_cfg, dtype=jnp.bfloat16)

    ckpt = wd / "reader" / "checkpoint" / "best_dev"
    if not ckpt.exists():
        t0 = time.time()
        res = train_reader(cfg, train_ex, eval_ex, tokenizer,
                           t5_config=t5_cfg)
        print(f"trained t5-small: best EM {100*res.best_dev_em:.1f} "
              f"in {time.time()-t0:.0f}s", flush=True)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 128), jnp.int32), jnp.ones((1, 1, 128), bool),
        jnp.zeros((1, 8), jnp.int32))["params"]
    params, _, _ = load_checkpoint(str(ckpt), template)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    # one fixed eval batch at the serving shape
    ds = ReaderDataset(eval_ex, cfg.data, seed=0)
    collator = ReaderCollator(cfg.data, tokenizer)
    batch = next(iter(batch_iterator(ds, args.batch_size, collator,
                                     shuffle=False)))
    ids = jnp.asarray(batch.passage_ids)
    mask = jnp.asarray(batch.passage_mask)

    results = {}
    lengths = None
    for chunk in (None, 4, 8, 16):
        eng = DecodeEngine(model, max_length=args.max_length,
                           chunk_size=chunk)
        out, _ = eng.generate(params, ids, mask)
        toks = np.asarray(out)
        if lengths is None:
            lengths = (toks != t5_cfg.pad_token_id).sum(axis=1)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out, _ = eng.generate(params, ids, mask)
            _ = int(np.asarray(out).sum())
            times.append(time.perf_counter() - t0)
        key = f"chunk_{chunk}" if chunk else "unchunked"
        results[key] = round(args.batch_size / min(times[1:]), 1)
        print(f"{key}: {results[key]} ans/s", flush=True)

    hist = {int(k): int(v) for k, v in
            zip(*np.unique(lengths, return_counts=True))}
    out = {"batch": args.batch_size, "max_length": args.max_length,
           "answer_token_length_histogram": hist,
           "answers_per_sec": results}
    print(json.dumps(out))
    (wd / "decode_short.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
