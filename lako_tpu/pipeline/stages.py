"""Pipeline stages — the six file-handoff stages of the reference
(run_okvqa_train_full.sh) as library functions over the SAME JSON schemas, so
artifacts are drop-in compatible:

reader example: {question, target, answer: {str: float}, img_id, caption,
                 fact: [{sentence, id, score?}]}
corpus row:     {sentence, id}

Stages: train_reader_stage → eval_reader_stage (writes cross-attention scores)
→ train_retriever_stage → embed_facts_stage → retrieve_stage / rerank_stage →
eval_facts_stage; iterate.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lako_tpu.core.checkpoint import load_checkpoint
from lako_tpu.core.config import (
    AttentionSignalConfig,
    ReaderDataConfig,
    ReaderTrainConfig,
    RetrieverConfig,
    RetrieverTrainConfig,
    T5Config,
    t5_config_for_size,
)
from lako_tpu.core.logging import get_logger
from lako_tpu.data import ReaderCollator, ReaderDataset, batch_iterator
from lako_tpu.models.retriever import Retriever
from lako_tpu.models.t5 import FiDT5
from lako_tpu.models.t5.decode import make_generate_fn
from lako_tpu.retrieval.embed import embed_corpus, embed_questions
from lako_tpu.retrieval.eval import hit_at_k
from lako_tpu.retrieval.index import DenseIndex, add_facts_to_examples
from lako_tpu.signal import (
    aggregate_fact_scores,
    apply_ans_attention_bonus,
    attach_scores_to_examples,
)
from lako_tpu.text.metrics import ems, includ_ems, stem_ems
from lako_tpu.train.reader import train_reader
from lako_tpu.train.retriever import train_retriever


def _load_json(path: str):
    return json.loads(Path(path).read_text())


def _save_json(obj, path: str):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(obj))


# ---------------------------------------------------------------------------
# Reader stages
# ---------------------------------------------------------------------------


def train_reader_stage(
    cfg: ReaderTrainConfig,
    train_data: str,
    eval_data: str,
    tokenizer,
    t5_config: Optional[T5Config] = None,
    init_params_path: Optional[str] = None,
    maxload: int = -1,
) -> Dict[str, Any]:
    import jax

    from lako_tpu.data import load_reader_data

    # per-process shard of the training data in multi-host runs (the sharding
    # the reference wired but never used, src/data.py:151-160)
    if jax.process_count() > 1:
        train_examples = load_reader_data(
            train_data, global_rank=jax.process_index(),
            world_size=jax.process_count(), maxload=maxload)
    else:
        train_examples = _load_json(train_data)
        if maxload > 0:  # small-data mode (reference data_process --tiny/--fast)
            train_examples = train_examples[:maxload]
    eval_examples = _load_json(eval_data)
    if maxload > 0:
        eval_examples = eval_examples[:maxload]
    t5_cfg = t5_config or t5_config_for_size(cfg.model_size,
                                             vocab_size=tokenizer.vocab_size)
    init_params = None
    if init_params_path:
        from lako_tpu.models.hf_io import is_hf_checkpoint_dir, load_hf_t5

        if is_hf_checkpoint_dir(init_params_path):
            # warm start straight from an HF save_pretrained directory
            # (single or sharded safetensors/bin) — the reference's load_t5
            # path (src/model.py:79-82, train_reader.py:243-250)
            t5_cfg, init_params = load_hf_t5(init_params_path)
        else:
            model = FiDT5(t5_cfg)
            B, N, L = 1, cfg.data.n_passages, cfg.data.text_maxlength
            template = model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((B, N, L), jnp.int32),
                                  jnp.ones((B, N, L), bool),
                                  jnp.zeros((B, cfg.data.answer_maxlength), jnp.int32),
                                  )["params"]
            init_params, _, _ = load_checkpoint(init_params_path, template)
    result = train_reader(cfg, train_examples, eval_examples, tokenizer,
                          init_params=init_params, t5_config=t5_cfg)
    return {"best_dev_em": result.best_dev_em, "steps": result.final_step,
            "history": result.history}


def eval_reader_stage(
    cfg: ReaderTrainConfig,
    signal_cfg: AttentionSignalConfig,
    eval_data: str,
    model_path: str,
    tokenizer,
    t5_config: Optional[T5Config] = None,
    write_results: Optional[str] = None,
    write_crossattention_scores: Optional[str] = None,
    num_beams: int = 1,
) -> Dict[str, Any]:
    """Evaluate EM/include/stem and optionally write the scored dataset for
    retriever distillation (reference test_reader.py:31-213).

    num_beams > 1 switches to beam search (cross-attention score writing
    requires greedy, matching the reference's pipeline which scores during
    greedy generate)."""
    logger = get_logger()
    examples = _load_json(eval_data)
    t5_cfg = t5_config or t5_config_for_size(cfg.model_size,
                                             vocab_size=tokenizer.vocab_size)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    from lako_tpu.models.hf_io import is_hf_checkpoint_dir, load_hf_t5

    if is_hf_checkpoint_dir(model_path):
        t5_cfg, params = load_hf_t5(model_path)
        model = FiDT5(t5_cfg, dtype=dtype)
    else:
        model = FiDT5(t5_cfg, dtype=dtype)
        B, N, L = 1, cfg.data.n_passages, cfg.data.text_maxlength
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((B, N, L), jnp.int32),
                              jnp.ones((B, N, L), bool),
                              jnp.zeros((B, cfg.data.answer_maxlength), jnp.int32),
                              )["params"]
        params, _, _ = load_checkpoint(model_path, template)

    collect = write_crossattention_scores is not None
    if num_beams > 1:
        if collect:
            raise ValueError("cross-attention score writing requires greedy decode")
        from lako_tpu.models.t5.decode import make_best_generate_fn

        # ancestry-gather beam engine when supported, flax beam otherwise;
        # dtype/chunk knobs forwarded so unsupported combos fail loudly in
        # the dispatcher instead of being silently dropped here
        generate_fn = make_best_generate_fn(
            model, max_length=cfg.eval_max_length, num_beams=num_beams,
            backend=cfg.decode_backend, kv_dtype=cfg.decode_kv_dtype,
            weights_dtype=cfg.decode_weights_dtype,
            chunk_size=cfg.decode_chunk_size,
            self_attn_impl=cfg.decode_self_attn_impl)
    elif collect:
        from lako_tpu.models.t5.decode import make_generate_and_score_fn

        generate_score_fn = make_generate_and_score_fn(
            model, signal_cfg, max_length=cfg.eval_max_length,
            backend=cfg.decode_backend, kv_dtype=cfg.decode_kv_dtype,
            weights_dtype=cfg.decode_weights_dtype,
            chunk_size=cfg.decode_chunk_size)
    else:
        from lako_tpu.models.t5.decode import make_best_generate_fn

        generate_fn = make_best_generate_fn(
            model, max_length=cfg.eval_max_length, collect_cross_scores=False,
            backend=cfg.decode_backend, kv_dtype=cfg.decode_kv_dtype,
            weights_dtype=cfg.decode_weights_dtype,
            chunk_size=cfg.decode_chunk_size)

    ds = ReaderDataset(examples, cfg.data, seed=cfg.seed)
    collator = ReaderCollator(cfg.data, tokenizer)

    em_scores, inc_scores, stem_scores = [], [], []
    results_json: List[dict] = []
    t0 = time.time()
    n_decoded = 0
    for batch in batch_iterator(ds, cfg.eval_batch_size, collator, shuffle=False):
        if collect:
            tokens, raw = generate_score_fn(
                params, jnp.asarray(batch.passage_ids),
                jnp.asarray(batch.passage_mask), jnp.asarray(batch.fact_spans))
            batch_examples = [ds.get_example(int(i)) for i in batch.index]
            scores = apply_ans_attention_bonus(np.asarray(raw), batch_examples,
                                               signal_cfg.n_context,
                                               signal_cfg.ans_attention)
        else:
            tokens, _ = generate_fn(params, jnp.asarray(batch.passage_ids),
                                    jnp.asarray(batch.passage_mask))
        decoded = tokenizer.batch_decode(np.asarray(tokens))
        for k, ans in enumerate(decoded):
            if not batch.valid[k]:
                continue
            example = ds.get_example(int(batch.index[k]))
            gold = example["answer"]
            em = ems(ans, gold)
            inc = includ_ems(ans, gold)
            st = stem_ems(ans, gold, dele_sw=True)
            em_scores.append(em)
            inc_scores.append(inc)
            stem_scores.append(st)
            n_decoded += 1
            if write_results is not None:
                results_json.append({
                    "question": example["question"],
                    "img_id": example["img_id"],
                    "answer": ans,
                    "target": example.get("target"),
                    "real answers": gold,
                    "fact": example.get("fact", [])[:50],
                    "include_score": inc,
                    "score": em,
                    "stem_score": st,
                })
            if collect:
                attach_scores_to_examples([example], scores[k:k + 1],
                                          signal_cfg.n_context)

    metrics = {
        "em": float(np.mean(em_scores)) if em_scores else 0.0,
        "include_em": float(np.mean(inc_scores)) if inc_scores else 0.0,
        "stem_em": float(np.mean(stem_scores)) if stem_scores else 0.0,
        "total": n_decoded,
        "answers_per_sec": n_decoded / max(time.time() - t0, 1e-9),
    }
    logger.info("evaluation: %.2fEM | include: %.2fEM | stem: %.2fEM | total %d",
                100 * metrics["em"], 100 * metrics["include_em"],
                100 * metrics["stem_em"], n_decoded)
    if write_results is not None:
        _save_json(results_json, write_results)
    if write_crossattention_scores is not None:
        _save_json(examples, write_crossattention_scores)
    return metrics


# ---------------------------------------------------------------------------
# Retriever stages
# ---------------------------------------------------------------------------


def train_retriever_stage(
    cfg: RetrieverTrainConfig,
    train_data: str,
    eval_data: str,
    tokenizer,
) -> Dict[str, Any]:
    result = train_retriever(cfg, _load_json(train_data), _load_json(eval_data),
                             tokenizer)
    return {"best_inversions": result.best_inversions, "steps": result.final_step,
            "history": result.history}


def eval_retriever_stage(
    cfg: RetrieverTrainConfig,
    data_path: str,
    model_path: str,
    tokenizer,
) -> Dict[str, Any]:
    """Standalone retriever ranking eval (inversions + top-k overlap,
    reference evaluation.py:200-229) of a CHECKPOINT on a scored data file.

    Exists so the full loop can compare retrievers across iterations against
    the SAME gold order: iteration N's inversions during training are scored
    against iteration N's reader attention, so the raw numbers are not
    comparable across N (each iteration's reader defines a different gold) —
    evaluating every iteration's retriever on iteration 1's scored file is.
    """
    from lako_tpu.core.config import ReaderDataConfig
    from lako_tpu.data import RetrieverCollator
    from lako_tpu.train.retriever import (evaluate_retriever,
                                          make_retriever_score_fn,
                                          sort_facts_by_gold)

    examples = _load_json(data_path)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model, params = _load_retriever(cfg.retriever, model_path, dtype=dtype)
    ds = ReaderDataset(sort_facts_by_gold(examples),
                       ReaderDataConfig(n_context=cfg.n_context), seed=cfg.seed)
    collator = RetrieverCollator(
        tokenizer, cfg.n_context,
        cfg.retriever.question_maxlength, cfg.retriever.passage_maxlength)
    score_fn = make_retriever_score_fn(model)
    return evaluate_retriever(score_fn, params, ds, collator,
                              cfg.eval_batch_size)


def _load_retriever(cfg: RetrieverConfig, model_path: str, dtype=jnp.float32):
    model = Retriever(cfg, dtype=dtype)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool),
        jnp.zeros((1, 1, 8), jnp.int32), jnp.ones((1, 1, 8), bool),
    )["params"]
    params, _, _ = load_checkpoint(model_path, template)
    return model, params


def embed_facts_stage(
    retriever_cfg: RetrieverConfig,
    model_path: str,
    corpus_path: str,        # [{sentence, id}]
    out_path: str,
    tokenizer,
    batch_size: int = 512,
    maxlength: Optional[int] = None,
) -> Dict[str, Any]:
    """Embed the whole KG corpus (reference generate_fact_embeddings.py:64-125);
    output is a DenseIndex directory instead of a pickle. ``maxlength``
    defaults to the retriever's trained passage_maxlength (embed.py)."""
    corpus = _load_json(corpus_path)
    model, params = _load_retriever(retriever_cfg, model_path)
    ids, emb = embed_corpus(model, params, corpus, tokenizer,
                            batch_size=batch_size, maxlength=maxlength)
    index = DenseIndex(emb, ids)
    index.save(out_path)
    return {"n_facts": len(ids), "dim": emb.shape[1], "index_path": out_path}


def _sampled_file_digest(path: Path, sample_bytes: int = 4 << 20) -> str:
    """Content fingerprint from the first+last ``sample_bytes`` of a file.

    mtime is useless here both ways: a same-size rewrite inside one mtime
    tick (coarse filesystems) must invalidate, and a byte-identical copy
    (rsync/tar of an index dir) must NOT force a 300k-vector PQ retrain.
    Sampling keeps the cost O(MB) on the ~300 MB corpus; embeddings that
    changed at all differ essentially everywhere, so head+tail suffices."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    size = path.stat().st_size
    with path.open("rb") as f:
        h.update(f.read(sample_bytes))
        if size > sample_bytes:
            f.seek(max(sample_bytes, size - sample_bytes))
            h.update(f.read(sample_bytes))
    return h.hexdigest()


def _load_or_train_pq(index_path: str, n_subquantizers: int = 32,
                      n_bits: int = 8):
    """PQ view of a dense index dir: codes live in ``<index_path>/pq`` and are
    trained once from ``embeddings.npy`` on first use (idempotent — reuse on
    every later retrieve). The cache records a fingerprint of the source
    embeddings file; re-running embed-facts into the same index dir (new
    corpus or retrained retriever) invalidates the codes and retrains them
    instead of silently scoring queries against the stale embedding space.
    Dimensions not divisible by 32 fall back to the largest power-of-two
    subquantizer count that divides d."""
    from lako_tpu.retrieval.pq import PQIndex

    emb_path = Path(index_path) / "embeddings.npy"
    pq_dir = Path(index_path) / "pq"
    src_meta = pq_dir / "source.json"
    have_cache = (pq_dir / "meta.json").exists()
    if not emb_path.exists():
        # PQ-only index dir (the dense corpus deleted to keep the 31x
        # memory win, or shipped without it): the cache is the only
        # possible source — serve it, staleness unverifiable
        if have_cache:
            return PQIndex.load(str(pq_dir))
        raise FileNotFoundError(
            f"{emb_path} is missing and {pq_dir} holds no trained codes; "
            "run embed-facts first")
    fingerprint = {"size": emb_path.stat().st_size,
                   "content": _sampled_file_digest(emb_path),
                   "n_subquantizers": n_subquantizers, "n_bits": n_bits}
    if have_cache:
        try:
            cached = json.loads(src_meta.read_text())
        except (OSError, json.JSONDecodeError):
            cached = None  # missing/torn fingerprint == stale, not fatal
        if cached == fingerprint:
            return PQIndex.load(str(pq_dir))
        get_logger().info(
            "PQ cache at %s is stale (embeddings.npy changed since codes "
            "were trained) — retraining", pq_dir)
    emb = np.load(emb_path)
    ids = np.load(Path(index_path) / "ids.npy")
    m = n_subquantizers
    while m > 1 and emb.shape[1] % m:
        m //= 2
    pq = PQIndex.train(emb, n_subquantizers=m, n_bits=n_bits, ids=ids)
    pq.save(str(pq_dir))
    src_meta.write_text(json.dumps(fingerprint))
    get_logger().info(
        "trained PQ-%dx%d over %d×%d: %.1f MB → %.2f MB", m, n_bits,
        emb.shape[0], emb.shape[1], emb.nbytes / 1e6, pq.nbytes() / 1e6)
    return pq


def retrieve_stage(
    retriever_cfg: RetrieverConfig,
    model_path: str,
    index_path: str,
    corpus_path: str,
    data_paths: Sequence[str],
    out_paths: Sequence[str],
    tokenizer,
    n_docs: int = 500,
    sharded: bool = False,
    index_method: str = "exact",
) -> Dict[str, Any]:
    """Full-corpus dense retrieval (reference fact_retrieval.py:124-211).
    ``sharded=True`` spreads the corpus over the mesh data axis (corpora larger
    than one chip's HBM). ``index_method``: "exact" (faiss-parity f32) |
    "fast" (bf16 scores, recall 0.9966 measured) | "approx"
    (retrieval/index.py docstring has the measured table) | "pq" (the
    reference's IndexPQ role, src/index.py:22-25: 32× smaller index, trained
    once from the dense index dir and cached in ``<index_path>/pq``)."""
    corpus = _load_json(corpus_path)
    id_to_sentence = {int(r["id"]): r["sentence"] for r in corpus}
    if n_docs > len(corpus):
        get_logger().warning(
            "retrieve: n_docs=%d > corpus size %d; retrieving every fact",
            n_docs, len(corpus))
        n_docs = len(corpus)
    if index_method == "pq":
        if sharded:
            raise ValueError(
                "index_method='pq' already compresses the corpus ~32x; it is "
                "single-chip by design — drop --sharded-index")
        index = _load_or_train_pq(index_path)
    elif sharded:
        import numpy as _np

        from lako_tpu.core.mesh import make_mesh
        from lako_tpu.retrieval.index import ShardedDenseIndex

        if index_method == "approx":
            raise ValueError(
                "index_method='approx' is not supported with sharded=True "
                "(approx_max_k's per-shard recall is not characterized "
                "under the shard merge); use exact or fast")
        base = DenseIndex.load(index_path)
        index = ShardedDenseIndex(_np.asarray(base._emb, _np.float32), make_mesh(),
                                  ids=base.ids, method=index_method)
    else:
        index = DenseIndex.load(index_path, method=index_method)
    model, params = _load_retriever(retriever_cfg, model_path)
    stats = {}
    for data_path, out_path in zip(data_paths, out_paths):
        examples = _load_json(data_path)
        q_emb = embed_questions(model, params, examples, tokenizer)
        ids, scores = index.search(q_emb, k=n_docs)
        add_facts_to_examples(examples, ids, scores, id_to_sentence)
        _save_json(examples, out_path)
        stats[data_path] = len(examples)
    return {"retrieved": stats, "n_docs": n_docs}


def rerank_stage(
    retriever_cfg: RetrieverConfig,
    model_path: str,
    index_path: str,
    corpus_path: str,
    data_paths: Sequence[str],
    out_paths: Sequence[str],
    tokenizer,
) -> Dict[str, Any]:
    """Small-range re-rank of each example's existing candidate facts
    (reference fact_retrieval_small_range.py:64-186)."""
    corpus = _load_json(corpus_path)
    id_to_sentence = {int(r["id"]): r["sentence"] for r in corpus}
    index = DenseIndex.load(index_path)
    model, params = _load_retriever(retriever_cfg, model_path)
    stats = {}
    for data_path, out_path in zip(data_paths, out_paths):
        examples = _load_json(data_path)
        q_emb = embed_questions(model, params, examples, tokenizer)
        # Ragged candidate lists → group rows by candidate count so each group
        # is one batched device call (real data is uniformly C=500, so this is
        # a single matmul pass, matching fact_retrieval_small_range.py:64-89).
        groups: Dict[int, list] = {}
        for i, ex in enumerate(examples):
            groups.setdefault(len(ex["fact"]), []).append(i)
        for count, rows in groups.items():
            if count == 0:
                continue
            cand = np.asarray(
                [[int(f["id"]) for f in examples[i]["fact"]] for i in rows],
                dtype=np.int64)
            ids, scores = index.rerank(cand, q_emb[np.asarray(rows)])
            for r, row_ids, row_scores in zip(rows, ids, scores):
                examples[r]["fact"] = [
                    {"sentence": id_to_sentence[int(fid)], "id": int(fid),
                     "score": float(s)}
                    for fid, s in zip(row_ids, row_scores)
                ]
        _save_json(examples, out_path)
        stats[data_path] = len(examples)
    return {"reranked": stats}


def eval_facts_stage(data_path: str, hitk=None) -> Dict[str, Any]:
    """Retrieval hit@k (reference evaluate_retrieved_facts.py)."""
    logger = get_logger()
    data = _load_json(data_path)
    kwargs = {"hitk": hitk} if hitk else {}
    inc, stem = hit_at_k(data, **kwargs)
    for k in sorted(inc):
        logger.info("top %d facts hits %.2f | stem %.2f", k, 100 * inc[k],
                    100 * stem[k])
    return {"include": inc, "stem": stem}
