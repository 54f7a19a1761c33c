"""Decoder cross-attention → per-fact retrieval-supervision scores.

Replaces the reference's monkey-patch + host token-walk pipeline
(src/model.py:100-204, test_reader.py:107-122) with a collate-time-span-based
aggregation over the first-decode-step cross-attention logits captured by
:mod:`lako_tpu.models.t5.decode`.

Semantics preserved exactly:
- scores are pre-softmax logits from the FIRST decode step only (score_storage is
  filled once, src/model.py:327-329);
- masked key positions contribute 0 (masked_fill, src/model.py:161);
- stream 2 splits (B, h, l, N·L) into passage/fact halves and uses the fact half
  summed over layers×heads (src/model.py:164-167);
- per-fact aggregation styles mean / max / 21mean (top-half mean)
  (src/model.py:107-115), where a fact's token span includes its terminal period;
- missing facts are padded with −5 (src/model.py:192-194);
- the result is divided by layers×heads, where the layer count is read from the
  tensor shape AFTER the last-half chunk (src/model.py:155-158,201-203): with
  use_last_half_layer_attention the divisor is (n_layers // 2) × heads, and the
  −5 pad is divided too;
- optional answer-hit bonus + per-row softmax (test_reader.py:110-119), or plain
  softmax otherwise (test_reader.py:76).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from lako_tpu.core.config import AttentionSignalConfig
from lako_tpu.text.metrics import includ_ems, stem_ems


def _style_aggregate(vals: np.ndarray, style: str) -> float:
    if style == "mean":
        return float(vals.mean())
    if style == "max":
        return float(vals.max())
    if style == "21mean":
        num = max(int((len(vals) + 1) / 2), 1)
        top = np.sort(vals)[::-1][:num]
        return float(top.mean())
    raise ValueError(f"unknown attention_score_style {style}")


def aggregate_fact_scores(
    cross_logits: np.ndarray,   # (B, layers, heads, K) first-step logits
    passage_mask: np.ndarray,   # (B, N, L) bool
    fact_spans: np.ndarray,     # (B, n_context, 2) spans in the fact passage
    cfg: AttentionSignalConfig,
) -> np.ndarray:
    """Returns (B, n_context) float scores (NOT yet softmaxed)."""
    assert cfg.stream == 2, "fact aggregation requires stream-2 batches"
    B, n_layers, n_heads, K = cross_logits.shape
    _, N, L = passage_mask.shape
    assert K == N * L, (K, N, L)

    scores = np.asarray(cross_logits, dtype=np.float64).copy()
    mask = passage_mask.reshape(B, 1, 1, K)
    scores = np.where(mask, scores, 0.0)

    used = scores.reshape(B, n_layers, n_heads, N, L)
    n_used_layers = n_layers
    if cfg.use_last_half_layer_attention:
        used = used[:, n_layers // 2:, :, :, :]
        n_used_layers = n_layers - n_layers // 2
    # stream 2: fact passage is index 1; sum over layers and heads
    fact_stream = used[:, :, :, 1, :].sum(axis=(1, 2))  # (B, L)

    out = np.full((B, cfg.n_context), cfg.pad_score, dtype=np.float64)
    for b in range(B):
        for j in range(cfg.n_context):
            s, e = int(fact_spans[b, j, 0]), int(fact_spans[b, j, 1])
            if e <= s:
                continue
            out[b, j] = _style_aggregate(fact_stream[b, s:e], cfg.attention_score_style)
    # normalize by USED layers×heads: the reference reads n_layers from the
    # tensor shape after the last-half chunk (src/model.py:155-158,201-203)
    out = out / (n_used_layers * n_heads)
    return out.astype(np.float32)


def question_passage_score(
    cross_logits: np.ndarray,   # (B, layers, heads, K)
    passage_mask: np.ndarray,   # (B, N, L)
    question_spans: np.ndarray,  # (B, 2) [start, end) of the question tokens in
                                 # passage 0 (after the "question:" prefix)
    cfg: AttentionSignalConfig,
) -> np.ndarray:
    """Per-example attention score of the question span in the first passage —
    the ``consider_context_attention`` signal (reference get_psg_score,
    src/model.py:117-141; defined there but wired to an unused flag). Provided
    for completeness with collate-time spans instead of token-id walking."""
    B, n_layers, n_heads, K = cross_logits.shape
    _, N, L = passage_mask.shape
    scores = np.where(passage_mask.reshape(B, 1, 1, K),
                      np.asarray(cross_logits, np.float64), 0.0)
    psg_stream = scores.reshape(B, n_layers, n_heads, N, L)[:, :, :, 0, :] \
        .sum(axis=(1, 2))  # (B, L)
    out = np.zeros(B, dtype=np.float64)
    for b in range(B):
        s, e = int(question_spans[b, 0]), int(question_spans[b, 1])
        if e > s:
            out[b] = _style_aggregate(psg_stream[b, s:e], cfg.attention_score_style)
    return (out / (n_layers * n_heads)).astype(np.float32)


def aggregate_fact_scores_device(
    cross_logits,   # (B, layers, heads, K) jax array, first-step logits
    passage_mask,   # (B, N, L) bool
    fact_spans,     # (B, n_context, 2) int32
    cfg: AttentionSignalConfig,
):
    """Jittable on-device version of :func:`aggregate_fact_scores` (same
    semantics, verified equal in tests). Keeping aggregation on device means
    only (B, n_context) floats cross the host boundary instead of the full
    (B, layers, heads, N·L) logit block."""
    import jax
    import jax.numpy as jnp

    assert cfg.stream == 2
    B, n_layers, n_heads, K = cross_logits.shape
    _, N, L = passage_mask.shape
    scores = jnp.where(passage_mask.reshape(B, 1, 1, K),
                       cross_logits.astype(jnp.float32), 0.0)
    used = scores.reshape(B, n_layers, n_heads, N, L)
    n_used_layers = n_layers
    if cfg.use_last_half_layer_attention:
        used = used[:, n_layers // 2:]
        n_used_layers = n_layers - n_layers // 2
    fact_stream = used[:, :, :, 1, :].sum(axis=(1, 2))  # (B, L)

    pos = jnp.arange(L)[None, None, :]                      # (1, 1, L)
    s = fact_spans[:, :, 0:1].astype(jnp.int32)             # (B, C, 1)
    e = fact_spans[:, :, 1:2].astype(jnp.int32)
    member = (pos >= s) & (pos < e)                         # (B, C, L)
    length = jnp.maximum((e - s)[..., 0], 1).astype(jnp.float32)  # (B, C)
    stream = fact_stream[:, None, :]                        # (B, 1, L)

    if cfg.attention_score_style == "mean":
        agg = jnp.sum(jnp.where(member, stream, 0.0), axis=-1) / length
    elif cfg.attention_score_style == "max":
        agg = jnp.max(jnp.where(member, stream, -jnp.inf), axis=-1)
    elif cfg.attention_score_style == "21mean":
        vals = jnp.where(member, stream, -jnp.inf)
        vals = jnp.sort(vals, axis=-1)[..., ::-1]           # desc
        num = jnp.maximum(((e - s)[..., 0] + 1) // 2, 1)    # (B, C)
        rank = jnp.arange(L)[None, None, :]
        take = rank < num[..., None]
        agg = jnp.sum(jnp.where(take, vals, 0.0), axis=-1) / num.astype(jnp.float32)
    else:
        raise ValueError(cfg.attention_score_style)

    empty = (e - s)[..., 0] <= 0
    agg = jnp.where(empty, cfg.pad_score, agg)
    # divisor uses the post-chunk layer count (src/model.py:155-158,201-203)
    return agg / (n_used_layers * n_heads)


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def apply_ans_attention_bonus(
    scores: np.ndarray,          # (B, n_context)
    examples: Sequence[dict],    # reader-format, aligned with rows
    n_context: int,
    ans_attention: bool,
) -> np.ndarray:
    """Answer-hit bonus + softmax normalization (test_reader.py:73-76,110-119).

    ans_attention=False: softmax over the whole row.
    ans_attention=True: add max(include-EM, stem-EM) of each fact sentence vs the
    gold answers, then softmax over the first range_num entries only.
    """
    out = np.asarray(scores, dtype=np.float32).copy()
    if not ans_attention:
        return _softmax(out)
    for k, ex in enumerate(examples):
        gold = ex["answer"]
        range_num = min(n_context, len(ex["fact"]))
        if range_num == 0:
            continue
        bonus = np.array([
            max(includ_ems(f["sentence"], gold),
                stem_ems(f["sentence"], gold, dele_sw=True))
            for f in ex["fact"][:range_num]
        ], dtype=np.float32)
        out[k, :range_num] += bonus
        out[k, :range_num] = _softmax(out[k, :range_num][None])[0]
    return out


def attach_scores_to_examples(
    examples: Sequence[dict],
    scores: np.ndarray,
    n_context: int,
) -> None:
    """Write scores into example['fact'][j]['score'] (test_reader.py:121-122)."""
    for k, ex in enumerate(examples):
        for j in range(min(n_context, len(ex["fact"]))):
            ex["fact"][j]["score"] = float(scores[k, j])
