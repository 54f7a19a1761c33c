"""Iterative reader↔retriever training loop.

Orchestrates the six stages of run_okvqa_train_full.sh:40-186 per iteration:
1. train reader on current fact-ranked data
2. eval reader on train+eval data, writing aggregated cross-attention scores
3. distill retriever on the scored data (KL)
4. embed the KG corpus with the best retriever
5. small-range re-rank every example's candidate facts
6. evaluate retrieval hit@k; next iteration's reader trains on the re-ranked data
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

from lako_tpu.core.config import (
    AttentionSignalConfig,
    ReaderTrainConfig,
    RetrieverTrainConfig,
    T5Config,
)
from lako_tpu.core.logging import get_logger


def _best_or_last(run_dir: Path) -> str:
    """best_dev when the metric ever improved, else the per-epoch last."""
    best = run_dir / "checkpoint" / "best_dev"
    return str(best if best.exists() else run_dir / "checkpoint" / "last")


def run_full_loop(args) -> Dict[str, Any]:
    from lako_tpu.pipeline.stages import (
        embed_facts_stage,
        eval_facts_stage,
        eval_reader_stage,
        rerank_stage,
        train_reader_stage,
        train_retriever_stage,
    )
    from lako_tpu.text.tokenizer import load_tokenizer

    logger = get_logger()
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    def _cfg(cls, path):
        if path is None:
            return cls()
        return cls.from_dict(json.loads(Path(path).read_text()))

    reader_cfg: ReaderTrainConfig = _cfg(ReaderTrainConfig, args.reader_config)
    retr_cfg: RetrieverTrainConfig = _cfg(RetrieverTrainConfig, args.retriever_config)
    t5_cfg = (T5Config.from_dict(json.loads(Path(args.t5_config).read_text()))
              if args.t5_config else None)
    tok = load_tokenizer(args.tokenizer)
    btok = load_tokenizer(args.bert_tokenizer, style="bert")

    train_data, eval_data = args.train_data, args.eval_data
    history = []
    prev_reader_ckpt = getattr(args, "reader_init", None)
    for it in range(1, args.iterations + 1):
        version = f"v{it}"
        logger.info("=== full-loop iteration %s ===", version)
        it_reader_cfg = reader_cfg.replace(
            checkpoint_dir=str(workdir), name=f"reader_{version}")
        it_retr_cfg = retr_cfg.replace(
            checkpoint_dir=str(workdir), name=f"retriever_{version}",
            n_context=reader_cfg.data.n_context)

        # 1. reader training (warm-started from the previous iteration's best
        # reader when requested — the reference's load_path warm start,
        # run_okvqa_train_full.sh:43-44)
        if it == 1:
            init_path = getattr(args, "reader_init", None)
        elif getattr(args, "warm_start_reader", False):
            init_path = prev_reader_ckpt
        else:
            init_path = None
        reader_out = train_reader_stage(it_reader_cfg, train_data, eval_data, tok,
                                        t5_config=t5_cfg,
                                        init_params_path=init_path)
        reader_ckpt = _best_or_last(workdir / f"reader_{version}")
        prev_reader_ckpt = reader_ckpt

        # 2. attention generate on both splits
        signal_cfg = AttentionSignalConfig(
            attention_score_style=args.attention_score_style,
            use_last_half_layer_attention=args.use_last_half_layer_attention,
            ans_attention=args.ans_attention,
            stream=reader_cfg.data.stream,
            n_context=reader_cfg.data.n_context,
        )
        scored_train = str(workdir / f"train_scored_{version}.json")
        scored_eval = str(workdir / f"eval_scored_{version}.json")
        eval_reader_stage(it_reader_cfg, signal_cfg, train_data, reader_ckpt, tok,
                          t5_config=t5_cfg,
                          write_crossattention_scores=scored_train)
        eval_metrics = eval_reader_stage(
            it_reader_cfg, signal_cfg, eval_data, reader_ckpt, tok,
            t5_config=t5_cfg, write_crossattention_scores=scored_eval)

        # 3. retriever distillation
        retr_out = train_retriever_stage(it_retr_cfg, scored_train, scored_eval, btok)
        retr_ckpt = _best_or_last(workdir / f"retriever_{version}")

        # 4. corpus embedding
        index_path = str(workdir / f"fact_index_{version}")
        embed_facts_stage(it_retr_cfg.retriever, retr_ckpt, args.corpus,
                          index_path, btok)

        # 5. small-range re-rank both splits
        new_train = str(workdir / f"train_reranked_{version}.json")
        new_eval = str(workdir / f"eval_reranked_{version}.json")
        rerank_stage(it_retr_cfg.retriever, retr_ckpt, index_path, args.corpus,
                     [train_data, eval_data], [new_train, new_eval], btok)

        # 6. retrieval quality
        n_facts_available = max(reader_cfg.data.n_context, 1)
        fact_metrics = eval_facts_stage(
            new_eval, hitk=[k for k in (1, 2, 5, 10, 20, 50, 100, 200, 500)
                            if k <= max(n_facts_available, 5)] or [1])

        history.append({
            "iteration": version,
            "reader_best_em": reader_out["best_dev_em"],
            "eval": eval_metrics,
            "retriever_best_inversions": retr_out["best_inversions"],
            "hit_at_k_include": fact_metrics["include"],
        })
        train_data, eval_data = new_train, new_eval

    (workdir / "full_loop_history.json").write_text(json.dumps(history, indent=2))
    return {"iterations": len(history), "history": history}
