"""Retriever distillation training (reference: train_retriever.py:37-154).

Trains the bi-encoder on KL divergence between its scores and the reader's
aggregated cross-attention scores. Evaluation reports ranking inversions and
top-k overlap against gold order (reference evaluate, train_retriever.py:114-154;
metrics src/evaluation.py:200-229), where eval batches arrive sorted by gold
score descending.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lako_tpu.core.checkpoint import save_checkpoint
from lako_tpu.core.config import RetrieverTrainConfig
from lako_tpu.core.logging import get_logger
from lako_tpu.core.mesh import make_mesh, replicated, shard_batch
from lako_tpu.data import ReaderDataset, RetrieverCollator, batch_iterator
from lako_tpu.models.retriever import Retriever
from lako_tpu.text.metrics import ranking_stats
from lako_tpu.train.optim import make_optimizer
from lako_tpu.train.state import TrainState


def _retriever_key(model: Retriever) -> tuple:
    from lako_tpu.core.program_cache import dtype_key

    return (model.config, dtype_key(model.dtype))


def make_retriever_train_step(model: Retriever) -> Callable:
    """Process-cached by retriever identity (core/program_cache.py), so the
    full loop's later iterations reuse the compiled step."""
    from lako_tpu.core.program_cache import cached_program

    return cached_program(("retriever_train_step", _retriever_key(model)),
                          lambda: _build_retriever_train_step(model))


def _build_retriever_train_step(model: Retriever) -> Callable:
    # donate the incoming state: halves train-state HBM (old+new buffers
    # never coexist) — at t5-large this is the difference between batch 32
    # fitting or OOMing on a 16 GB chip
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, q_ids, q_mask, p_ids, p_mask, gold, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            _, _, _, loss = model.apply(
                {"params": params}, q_ids, q_mask, p_ids, p_mask, gold,
                deterministic=False, rngs={"dropout": rng},
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return train_step


def make_retriever_score_fn(model: Retriever) -> Callable:
    from lako_tpu.core.program_cache import cached_program

    def build():
        @jax.jit
        def score_fn(params, q_ids, q_mask, p_ids, p_mask):
            _, _, score, _ = model.apply(
                {"params": params}, q_ids, q_mask, p_ids, p_mask
            )
            return score

        return score_fn

    return cached_program(("retriever_score", _retriever_key(model)), build)


def sort_facts_by_gold(examples: Sequence[dict]) -> List[dict]:
    """Eval data is consumed with facts sorted by gold score descending
    (the reference's tmp_dir eval files are written that way)."""
    out = []
    for ex in examples:
        ex = dict(ex)
        ex["fact"] = sorted(ex["fact"], key=lambda c: -float(c.get("score", 0.0)))
        out.append(ex)
    return out


def evaluate_retriever(
    score_fn: Callable,
    params,
    dataset: ReaderDataset,
    collator: RetrieverCollator,
    batch_size: int,
    avg_topk=(1, 2, 5),
    idx_topk=(1, 2, 5),
) -> Dict[str, Any]:
    inversions: List[int] = []
    avg: Dict[int, list] = {k: [] for k in avg_topk}
    idx: Dict[int, list] = {k: [] for k in idx_topk}
    for batch in batch_iterator(dataset, batch_size, collator, shuffle=False):
        score = np.asarray(score_fn(
            params, jnp.asarray(batch.question_ids), jnp.asarray(batch.question_mask),
            jnp.asarray(batch.passage_ids), jnp.asarray(batch.passage_mask),
        ))
        for b in range(len(score)):
            if not batch.valid[b]:
                continue
            n = int(batch.n_facts[b])
            if n < 2:
                continue
            ranking_stats(score[None, b, :n], inversions, avg, idx)
    return {
        "inversions": float(np.mean(inversions)) if inversions else 0.0,
        "avg_topk": {k: float(np.mean(v)) if v else 0.0 for k, v in avg.items()},
        "idx_topk": {k: float(np.mean(v)) if v else 0.0 for k, v in idx.items()},
        "total": len(inversions),
    }


@dataclass
class RetrieverTrainResult:
    best_inversions: float
    final_step: int
    history: List[Dict[str, float]]
    state: TrainState


def train_retriever(
    cfg: RetrieverTrainConfig,
    train_examples: Sequence[dict],
    eval_examples: Sequence[dict],
    tokenizer,
    init_params: Optional[Any] = None,
    mesh=None,
    save_checkpoints: bool = True,
) -> RetrieverTrainResult:
    from lako_tpu.core.config import ReaderDataConfig

    logger = get_logger()
    mesh = mesh or make_mesh(cfg.mesh)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = Retriever(cfg.retriever, dtype=dtype)

    data_cfg = ReaderDataConfig(n_context=cfg.n_context)
    train_ds = ReaderDataset(train_examples, data_cfg, seed=cfg.seed)
    eval_ds = ReaderDataset(sort_facts_by_gold(eval_examples), data_cfg, seed=cfg.seed)
    collator = RetrieverCollator(
        tokenizer, cfg.n_context,
        cfg.retriever.question_maxlength, cfg.retriever.passage_maxlength,
    )

    global_batch = cfg.per_device_batch_size * mesh.shape[cfg.mesh.batch_axis]
    steps_per_epoch = max(1, len(train_ds) // global_batch)
    total_steps = steps_per_epoch * cfg.epochs
    optim_cfg = cfg.optim.replace(total_steps=total_steps,
                                  warmup_steps=max(1, int(0.06 * total_steps)),
                                  scheduler="linear")
    tx = make_optimizer(optim_cfg)

    rng = jax.random.PRNGKey(cfg.seed)
    if init_params is None:
        b = batch_iterator(train_ds, 2, collator).__next__()
        init_rng, rng = jax.random.split(rng)
        init_params = model.init(
            init_rng, jnp.asarray(b.question_ids), jnp.asarray(b.question_mask),
            jnp.asarray(b.passage_ids), jnp.asarray(b.passage_mask),
        )["params"]
    init_params = jax.device_put(init_params, replicated(mesh))
    state = TrainState.create(init_params, tx)

    train_step = make_retriever_train_step(model)
    score_fn = make_retriever_score_fn(model)

    best_inversions, patience, step = float("inf"), 0, 0
    history: List[Dict[str, float]] = []
    ckpt_dir = f"{cfg.checkpoint_dir}/{cfg.name}"
    for epoch in range(1, cfg.epochs + 1):
        t0 = time.time()
        losses = []
        for batch in batch_iterator(train_ds, global_batch, collator,
                                    shuffle=True, seed=cfg.seed + epoch,
                                    drop_last=True, prefetch=2):
            sharded = shard_batch(mesh, {
                "q_ids": batch.question_ids, "q_mask": batch.question_mask,
                "p_ids": batch.passage_ids, "p_mask": batch.passage_mask,
                "gold": batch.gold_scores,
            })
            state, loss = train_step(state, sharded["q_ids"], sharded["q_mask"],
                                     sharded["p_ids"], sharded["p_mask"],
                                     sharded["gold"], rng)
            losses.append(loss)
            step += 1
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

        patience += 1
        ev = evaluate_retriever(score_fn, state.params, eval_ds, collator,
                                cfg.eval_batch_size)
        inv = ev["inversions"]
        history.append({"epoch": epoch, "loss": train_loss, "inversions": inv,
                        "seconds": time.time() - t0})
        logger.info("epoch %d | step %d | loss: %.4f | inversions: %.3f | %.1fs",
                    epoch, step, train_loss, inv, time.time() - t0)
        if inv < best_inversions:
            patience = 0
            best_inversions = inv
            if save_checkpoints:
                save_checkpoint(ckpt_dir, "best_dev", state.params, state.opt_state,
                                step, inv)
        if save_checkpoints:
            save_checkpoint(ckpt_dir, "last", state.params, state.opt_state,
                            step, best_inversions)
        if patience > cfg.early_stop:
            logger.info("early stop in epoch %d", epoch)
            break

    return RetrieverTrainResult(best_inversions, step, history, state)
