"""lako — one CLI for the whole pipeline.

Replaces the reference's three shell scripts (run_okvqa_train.sh,
run_okvqa_test.sh, run_okvqa_train_full.sh) and their bash-variable config with
subcommands over typed JSON configs. Stage artifacts use the reference JSON
schemas, so data is drop-in compatible.

Usage: python -m lako_tpu.pipeline.cli <subcommand> ...
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from lako_tpu.core.config import (
    AttentionSignalConfig,
    ReaderTrainConfig,
    RetrieverConfig,
    RetrieverTrainConfig,
    T5Config,
)
from lako_tpu.core.logging import init_logger


def _load_cfg(cls, path):
    if path is None:
        return cls()
    return cls.from_dict(json.loads(Path(path).read_text()))


def _tokenizer(path: str, style: str = "t5"):
    from lako_tpu.text.tokenizer import load_tokenizer

    return load_tokenizer(path, style=style)


def _t5_cfg(args, tokenizer):
    if getattr(args, "t5_config", None):
        return T5Config.from_dict(json.loads(Path(args.t5_config).read_text()))
    return None


def cmd_build_tokenizer(args):
    from lako_tpu.text.tokenizer import HFTokenizer, WordVocabTokenizer

    corpus = []
    for p in args.from_json or []:
        data = json.loads(Path(p).read_text())
        for ex in data:
            if "sentence" in ex:
                corpus.append(ex["sentence"])
                continue
            corpus.append(ex.get("question", ""))
            corpus.append(ex.get("caption", ""))
            corpus.extend(f["sentence"] for f in ex.get("fact", []))
            corpus.extend(ex.get("answer", {}).keys())
    for p in args.from_text or []:
        corpus.extend(Path(p).read_text().splitlines())
    corpus = [c for c in corpus if c]
    # prefixes must be in-vocab
    corpus += ["question: context: fact:"] * 5

    if args.kind == "word":
        tok = WordVocabTokenizer.build(corpus, style=args.style,
                                       max_vocab=args.vocab_size)
    elif args.kind == "unigram":
        tok = HFTokenizer.train_unigram(corpus, vocab_size=args.vocab_size)
    elif args.kind == "wordpiece":
        tok = HFTokenizer.train_wordpiece(corpus, vocab_size=args.vocab_size)
    else:
        raise SystemExit(f"unknown tokenizer kind {args.kind}")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    tok.save(args.out)
    print(json.dumps({"vocab_size": tok.vocab_size, "out": args.out}))


def cmd_train_reader(args):
    from lako_tpu.pipeline.stages import train_reader_stage

    cfg = _load_cfg(ReaderTrainConfig, args.config)
    tok = _tokenizer(args.tokenizer)
    out = train_reader_stage(cfg, args.train_data, args.eval_data, tok,
                             t5_config=_t5_cfg(args, tok),
                             init_params_path=args.model_path,
                             maxload=args.maxload)
    print(json.dumps(out))


def cmd_eval_reader(args):
    from lako_tpu.pipeline.stages import eval_reader_stage

    cfg = _load_cfg(ReaderTrainConfig, args.config)
    signal_cfg = AttentionSignalConfig(
        attention_score_style=args.attention_score_style,
        use_last_half_layer_attention=args.use_last_half_layer_attention,
        ans_attention=args.ans_attention,
        stream=cfg.data.stream,
        n_context=cfg.data.n_context,
    )
    tok = _tokenizer(args.tokenizer)
    out = eval_reader_stage(
        cfg, signal_cfg, args.eval_data, args.model_path, tok,
        t5_config=_t5_cfg(args, tok),
        write_results=args.write_results,
        write_crossattention_scores=args.write_crossattention_scores,
        num_beams=args.num_beams,
    )
    print(json.dumps(out))


def cmd_train_retriever(args):
    from lako_tpu.pipeline.stages import train_retriever_stage

    cfg = _load_cfg(RetrieverTrainConfig, args.config)
    tok = _tokenizer(args.tokenizer, style="bert")
    out = train_retriever_stage(cfg, args.train_data, args.eval_data, tok)
    print(json.dumps(out))


def cmd_embed_facts(args):
    from lako_tpu.pipeline.stages import embed_facts_stage

    cfg = _load_cfg(RetrieverTrainConfig, args.config).retriever
    tok = _tokenizer(args.tokenizer, style="bert")
    out = embed_facts_stage(cfg, args.model_path, args.corpus, args.out, tok,
                            batch_size=args.batch_size)
    print(json.dumps(out))


def cmd_retrieve(args):
    from lako_tpu.pipeline.stages import rerank_stage, retrieve_stage

    cfg = _load_cfg(RetrieverTrainConfig, args.config).retriever
    tok = _tokenizer(args.tokenizer, style="bert")
    fn = rerank_stage if args.small_range else retrieve_stage
    kwargs = {} if args.small_range else {"n_docs": args.n_docs,
                                          "sharded": args.sharded_index,
                                          "index_method": args.index_method}
    out = fn(cfg, args.model_path, args.index, args.corpus,
             args.data, args.out, tok, **kwargs)
    print(json.dumps(out))


def cmd_eval_facts(args):
    from lako_tpu.pipeline.stages import eval_facts_stage

    out = eval_facts_stage(args.data, hitk=args.hitk)
    print(json.dumps(out))


def cmd_mine_candidates(args):
    from lako_tpu.retrieval.candidates import CandidateMiner
    from lako_tpu.retrieval.verbalize import verbalize_triples

    triples = json.loads(Path(args.triples).read_text())
    if isinstance(triples, dict):  # reference triplestemindex_database format
        triples = [triples[k] for k in sorted(triples, key=lambda x: int(x))]
    templates = json.loads(Path(args.templates).read_text()) if args.templates else {}
    four_tuple = verbalize_triples(triples, templates)
    if args.corpus_out:
        corpus = [{"sentence": t[3] + ".", "id": i}
                  for i, t in enumerate(four_tuple)]
        Path(args.corpus_out).write_text(json.dumps(corpus))
    if args.data:
        miner = CandidateMiner(four_tuple)
        rows = json.loads(Path(args.data).read_text())
        img2caption = json.loads(Path(args.captions).read_text())
        # reference caption dicts may be [{"caption": str}, ...] per image
        img2caption = {
            k: [c["caption"] if isinstance(c, dict) else c for c in v]
            for k, v in img2caption.items()
        }
        image2text = (json.loads(Path(args.ocr).read_text())
                      if args.ocr else {})
        out = miner.mine_dataset(rows, img2caption, image2text, k=args.k)
        Path(args.out).write_text(json.dumps(out))
        print(json.dumps({"examples": len(out), "out": args.out}))
    else:
        print(json.dumps({"facts": len(four_tuple)}))


def cmd_prep_answers(args):
    from lako_tpu.text.vqa_answers import compute_targets, create_ans2label

    annotations = json.loads(Path(args.annotations).read_text())
    if isinstance(annotations, dict):
        annotations = annotations["annotations"]
    questions = json.loads(Path(args.questions).read_text())
    if isinstance(questions, dict):
        questions = questions["questions"]
    id2question = {str(q["question_id"]): q["question"] for q in questions}
    ans2label, label2ans = create_ans2label(annotations, args.dataset,
                                            args.min_occurence)
    targets = compute_targets(annotations, ans2label, id2question)
    outdir = Path(args.out_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "trainval_ans2label.json").write_text(json.dumps(ans2label))
    (outdir / "trainval_label2ans.json").write_text(json.dumps(label2ans))
    (outdir / f"{args.split}.json").write_text(json.dumps(targets))
    print(json.dumps({"answers": len(ans2label), "examples": len(targets)}))


def cmd_serve(args):
    """Load reader (+ optional retriever/index) and serve POST /answer."""
    import jax
    import jax.numpy as jnp

    from lako_tpu.core.checkpoint import load_checkpoint
    from lako_tpu.models.t5 import FiDT5
    from lako_tpu.serve import LakoService, ServiceConfig, run_http_server

    cfg = _load_cfg(ReaderTrainConfig, args.config)
    tok = _tokenizer(args.tokenizer)
    t5_cfg = _t5_cfg(args, tok) or __import__(
        "lako_tpu.core.config", fromlist=["t5_config_for_size"]
    ).t5_config_for_size(cfg.model_size, vocab_size=tok.vocab_size)
    model = FiDT5(t5_cfg)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.data.n_passages, cfg.data.text_maxlength), jnp.int32),
        jnp.ones((1, cfg.data.n_passages, cfg.data.text_maxlength), bool),
        jnp.zeros((1, cfg.data.answer_maxlength), jnp.int32),
    )["params"]
    params, _, _ = load_checkpoint(args.model_path, template)

    retriever = retriever_params = btok = index = None
    id_to_sentence = None
    if args.retriever_path and args.index and args.corpus:
        from lako_tpu.pipeline.stages import _load_retriever
        from lako_tpu.retrieval.index import DenseIndex

        rt_cfg = _load_cfg(RetrieverTrainConfig, args.retriever_config).retriever
        retriever, retriever_params = _load_retriever(rt_cfg, args.retriever_path)
        btok = _tokenizer(args.bert_tokenizer, style="bert")
        index = DenseIndex.load(args.index)
        corpus = json.loads(Path(args.corpus).read_text())
        id_to_sentence = {int(r["id"]): r["sentence"] for r in corpus}

    service = LakoService(
        ServiceConfig(batch_size=args.batch_size, max_length=cfg.eval_max_length,
                      n_context=cfg.data.n_context, data=cfg.data,
                      dtype=cfg.dtype, num_beams=args.num_beams,
                      decode_backend=cfg.decode_backend,
                      decode_kv_dtype=cfg.decode_kv_dtype,
                      decode_weights_dtype=cfg.decode_weights_dtype,
                      decode_chunk_size=cfg.decode_chunk_size,
                      batch_window_ms=args.batch_window_ms,
                      mesh_model=args.mesh_model,
                      engine_policy=args.engine_policy,
                      policy_chunked_min_occupancy=(
                          args.policy_chunked_min_occupancy)),
        t5_cfg, params, tok,
        retriever=retriever, retriever_params=retriever_params,
        bert_tokenizer=btok, index=index, id_to_sentence=id_to_sentence,
    )
    print(json.dumps({"serving": f"http://{args.host}:{args.port}/answer"}))
    run_http_server(service, args.host, args.port)


def cmd_truncate_data(args):
    """Keep the first K examples (reference deal_vqa.py:1-28)."""
    from lako_tpu.data.prompt import truncate_dataset

    data = json.loads(Path(args.data).read_text())
    out = truncate_dataset(data, args.keep)
    Path(args.out).write_text(json.dumps(out))
    print(json.dumps({"kept": len(out), "out": args.out}))


def cmd_prep_questions(args):
    """id2question + question Dictionary (+ optional GloVe embedding matrix) —
    the reference deal_data.py Runner's question-side outputs."""
    import numpy as np

    from lako_tpu.text.dictionary import Dictionary, WordVectors, build_id2question

    questions = json.loads(Path(args.questions).read_text())
    if isinstance(questions, dict):
        questions = questions["questions"]
    id2q = build_id2question(questions)
    outdir = Path(args.out_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "id2question.json").write_text(json.dumps(id2q))

    d = Dictionary()
    for q in id2q.values():
        d.tokenize(q, add_word=True)
    d.dump_to_file(str(outdir / "qs_dictionary.pkl"))

    out = {"questions": len(id2q), "vocab": len(d)}
    if args.glove:
        wv = WordVectors(args.glove)
        mat = wv.embedding_matrix(d)
        np.save(outdir / "glove_init.npy", mat)
        out["glove_matrix"] = list(mat.shape)
    print(json.dumps(out))


def cmd_full_loop(args):
    from lako_tpu.pipeline.full_loop import run_full_loop

    out = run_full_loop(args)
    print(json.dumps(out))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="lako", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("build-tokenizer", help="train a tokenizer from data")
    t.add_argument("--from-json", nargs="*", help="reader/corpus JSON files")
    t.add_argument("--from-text", nargs="*", help="plain text files")
    t.add_argument("--out", required=True)
    t.add_argument("--style", default="t5", choices=["t5", "bert"])
    t.add_argument("--kind", default="word", choices=["word", "unigram", "wordpiece"])
    t.add_argument("--vocab-size", type=int, default=32000)
    t.set_defaults(fn=cmd_build_tokenizer)

    t = sub.add_parser("train-reader", help="train the FiD reader")
    t.add_argument("--config", help="ReaderTrainConfig JSON")
    t.add_argument("--t5-config", help="T5Config JSON (else size preset)")
    t.add_argument("--train-data", required=True)
    t.add_argument("--eval-data", required=True)
    t.add_argument("--tokenizer", required=True)
    t.add_argument("--model-path", help="warm-start checkpoint dir")
    t.add_argument("--maxload", type=int, default=-1,
                   help="small-data mode: cap loaded examples (reference --tiny/--fast role)")
    t.set_defaults(fn=cmd_train_reader)

    t = sub.add_parser("eval-reader", help="evaluate reader / write attention scores")
    t.add_argument("--config")
    t.add_argument("--t5-config")
    t.add_argument("--eval-data", required=True)
    t.add_argument("--model-path", required=True)
    t.add_argument("--tokenizer", required=True)
    t.add_argument("--write-results")
    t.add_argument("--write-crossattention-scores")
    t.add_argument("--attention-score-style", default="mean",
                   choices=["mean", "max", "21mean"])
    t.add_argument("--use-last-half-layer-attention", action="store_true")
    t.add_argument("--ans-attention", action="store_true")
    t.add_argument("--num-beams", type=int, default=1)
    t.set_defaults(fn=cmd_eval_reader)

    t = sub.add_parser("train-retriever", help="distill retriever from attention")
    t.add_argument("--config")
    t.add_argument("--train-data", required=True)
    t.add_argument("--eval-data", required=True)
    t.add_argument("--tokenizer", required=True)
    t.set_defaults(fn=cmd_train_retriever)

    t = sub.add_parser("embed-facts", help="embed the KG corpus into an index")
    t.add_argument("--config")
    t.add_argument("--model-path", required=True)
    t.add_argument("--corpus", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--tokenizer", required=True)
    t.add_argument("--batch-size", type=int, default=512)
    t.set_defaults(fn=cmd_embed_facts)

    t = sub.add_parser("retrieve", help="dense retrieval (full or small-range)")
    t.add_argument("--config")
    t.add_argument("--model-path", required=True)
    t.add_argument("--index", required=True)
    t.add_argument("--corpus", required=True)
    t.add_argument("--data", nargs="+", required=True)
    t.add_argument("--out", nargs="+", required=True)
    t.add_argument("--tokenizer", required=True)
    t.add_argument("--n-docs", type=int, default=500)
    t.add_argument("--index-method", default="exact",
                   choices=["exact", "fast", "approx", "pq"],
                   help="exact = faiss-parity f32 scores; fast = bf16 "
                        "scores + exact top-k (recall 0.9966 measured); "
                        "approx = approx_max_k (recall 0.9927); pq = "
                        "32x-compressed product quantizer (reference "
                        "IndexPQ, trained+cached in <index>/pq)")
    t.add_argument("--small-range", action="store_true",
                   help="re-rank each example's existing candidates")
    t.add_argument("--sharded-index", action="store_true",
                   help="shard the corpus over the mesh data axis")
    t.set_defaults(fn=cmd_retrieve)

    t = sub.add_parser("eval-facts", help="retrieval hit@k")
    t.add_argument("--data", required=True)
    t.add_argument("--hitk", nargs="*", type=int)
    t.set_defaults(fn=cmd_eval_facts)

    t = sub.add_parser("mine-candidates", help="verbalize KG + BM25 top-k facts")
    t.add_argument("--triples", required=True)
    t.add_argument("--templates")
    t.add_argument("--data", help="cache-format rows {sent,label,img_id}")
    t.add_argument("--captions", help="img_id -> captions JSON")
    t.add_argument("--ocr", help="img_id -> OCR text JSON")
    t.add_argument("--out")
    t.add_argument("--corpus-out", help="write verbalized corpus [{sentence,id}]")
    t.add_argument("--k", type=int, default=500)
    t.set_defaults(fn=cmd_mine_candidates)

    t = sub.add_parser("prep-answers", help="VQA answer vocab + soft targets")
    t.add_argument("--annotations", required=True)
    t.add_argument("--questions", required=True)
    t.add_argument("--dataset", default="okvqa", choices=["okvqa", "vqa2.0"])
    t.add_argument("--min-occurence", type=int, default=3)
    t.add_argument("--split", default="train")
    t.add_argument("--out-dir", required=True)
    t.set_defaults(fn=cmd_prep_answers)

    t = sub.add_parser("serve", help="HTTP QA service: retrieve + read")
    t.add_argument("--config")
    t.add_argument("--t5-config")
    t.add_argument("--model-path", required=True)
    t.add_argument("--tokenizer", required=True)
    t.add_argument("--retriever-config")
    t.add_argument("--retriever-path")
    t.add_argument("--bert-tokenizer")
    t.add_argument("--index")
    t.add_argument("--corpus")
    t.add_argument("--host", default="127.0.0.1")
    t.add_argument("--port", type=int, default=8080)
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--num-beams", type=int, default=1)
    t.add_argument("--batch-window-ms", type=float, default=0.0,
                   help="dynamic micro-batching window (0 = off): concurrent "
                        "requests within the window share one device batch")
    t.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel width for big-model serving "
                        "(t5-3b+); params committed with Megatron specs, "
                        "GSPMD partitions the whole decode")
    t.add_argument("--engine-policy", default="fixed",
                   choices=["fixed", "auto"],
                   help="auto = chunked early-exit decode only when batch "
                        "occupancy reaches the measured win threshold; "
                        "fixed = always the configured chunk size")
    t.add_argument("--policy-chunked-min-occupancy", type=int, default=None,
                   help="occupancy at which engine-policy=auto switches to "
                        "chunked decode (default: max(batch_size//2, 5); "
                        "must be <= batch-size)")
    t.set_defaults(fn=cmd_serve)

    t = sub.add_parser("truncate-data", help="keep the first K examples of a JSON dataset")
    t.add_argument("--data", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--keep", type=int, required=True)
    t.set_defaults(fn=cmd_truncate_data)

    t = sub.add_parser("prep-questions", help="id2question + dictionary + GloVe matrix")
    t.add_argument("--questions", required=True)
    t.add_argument("--glove", help="local GloVe-format txt (optional)")
    t.add_argument("--out-dir", required=True)
    t.set_defaults(fn=cmd_prep_questions)

    t = sub.add_parser("full-loop", help="iterative reader/retriever loop")
    t.add_argument("--workdir", required=True)
    t.add_argument("--reader-config")
    t.add_argument("--retriever-config")
    t.add_argument("--t5-config")
    t.add_argument("--train-data", required=True)
    t.add_argument("--eval-data", required=True)
    t.add_argument("--corpus", required=True)
    t.add_argument("--tokenizer", required=True)
    t.add_argument("--bert-tokenizer", required=True)
    t.add_argument("--iterations", type=int, default=2)
    t.add_argument("--warm-start-reader", action="store_true",
                   help="initialize each iteration's reader from the previous "
                        "iteration's best checkpoint (reference load_path role)")
    t.add_argument("--reader-init",
                   help="checkpoint dir every iteration's reader starts from "
                        "(the reference's pretrained-t5 model_path base); "
                        "--warm-start-reader overrides it from iteration 2 on")
    t.add_argument("--attention-score-style", default="mean")
    t.add_argument("--ans-attention", action="store_true")
    t.add_argument("--use-last-half-layer-attention", action="store_true")
    t.add_argument("--fact-ablation", action="store_true",
                   help="per iteration, also evaluate the reader with "
                        "shuffled facts (fact-sensitivity diagnostic; one "
                        "extra eval pass)")
    t.set_defaults(fn=cmd_full_loop)

    return p


def main(argv=None):
    from lako_tpu.core.cache import enable_compilation_cache

    args = build_parser().parse_args(argv)
    init_logger()
    enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
