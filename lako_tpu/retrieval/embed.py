"""Batched corpus / question embedding with the retriever.

Replaces generate_fact_embeddings.py:33-61 and the embed_questions paths
(fact_retrieval.py:39-60): fixed-shape jitted embed steps over the tokenized
corpus; returns float32 numpy arrays ready for :class:`DenseIndex`.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lako_tpu.data.collator import TextCollator
from lako_tpu.models.retriever import Retriever


def make_embed_fn(model: Retriever, text_type: str = "f") -> Callable:
    @jax.jit
    def embed(params, ids, mask):
        return model.apply(
            {"params": params}, ids, mask, text_type,
            apply_mask=model.config.apply_passage_mask if text_type == "f"
            else model.config.apply_question_mask,
            extract_cls=model.config.extract_cls,
            method=Retriever.embed_text,
        )

    return embed


def embed_corpus(
    model: Retriever,
    params,
    sentences: Sequence[dict],   # [{"sentence": str, "id": int}]
    tokenizer,
    batch_size: int = 512,
    maxlength: int = 100,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (ids (n,), embeddings (n, dim) float32) in input order."""
    collator = TextCollator(tokenizer, maxlength=maxlength)
    embed = make_embed_fn(model, "f")
    all_ids: List[np.ndarray] = []
    all_emb: List[np.ndarray] = []
    for s in range(0, len(sentences), batch_size):
        chunk = list(sentences[s : s + batch_size])
        fact_ids, ids, mask = collator(chunk, pad_to=batch_size)
        emb = embed(params, jnp.asarray(ids), jnp.asarray(mask))
        emb = np.asarray(emb, dtype=np.float32)[: len(chunk)]
        all_ids.append(fact_ids[: len(chunk)])
        all_emb.append(emb)
    return np.concatenate(all_ids), np.concatenate(all_emb)


def embed_questions(
    model: Retriever,
    params,
    examples: Sequence[dict],    # reader-format: {"question", "caption", ...}
    tokenizer,
    batch_size: int = 512,
    maxlength: int = 130,
) -> np.ndarray:
    """Question+caption embeddings (reference prepends no prefix here —
    fact_retrieval.py embeds ``question + " " + caption``)."""
    embed = make_embed_fn(model, "q")
    out: List[np.ndarray] = []
    for s in range(0, len(examples), batch_size):
        chunk = examples[s : s + batch_size]
        texts = [ex["question"] + " " + ex["caption"] for ex in chunk]
        ids, mask = tokenizer.batch_encode(texts, maxlength)
        if len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
        emb = embed(params, jnp.asarray(ids), jnp.asarray(mask))
        out.append(np.asarray(emb, dtype=np.float32)[: len(chunk)])
    return np.concatenate(out)
