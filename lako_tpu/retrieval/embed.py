"""Batched corpus / question embedding with the retriever.

Replaces generate_fact_embeddings.py:33-61 and the embed_questions paths
(fact_retrieval.py:39-60): fixed-shape jitted embed steps over the tokenized
corpus; returns float32 numpy arrays ready for :class:`DenseIndex`.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lako_tpu.data.collator import TextCollator
from lako_tpu.models.retriever import Retriever


def make_embed_fn(model: Retriever, text_type: str = "f") -> Callable:
    """Process-cached by (retriever identity, text_type): repeated
    embed-facts / retrieve stage invocations reuse the compiled program
    (core/program_cache.py)."""
    from lako_tpu.core.program_cache import cached_program, dtype_key

    def build():
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

    return cached_program(
        ("retriever_embed", model.config, dtype_key(model.dtype), text_type),
        build)


def _check_finite(emb: np.ndarray, what: str) -> None:
    """NaN embeddings make every downstream score NaN, and NaN scores make
    argsort a silent no-op — the round-4 root cause of the full loop's
    re-rank doing nothing (tokenizing past the BERT's position table turned
    the whole embedding matrix NaN without a single error). Fail here, at
    the source, with a diagnosis."""
    if not np.isfinite(emb).all():
        raise FloatingPointError(
            f"{what} embeddings contain non-finite values "
            f"({np.isnan(emb).sum()} NaN / {np.isinf(emb).sum()} inf of "
            f"{emb.size}). Common cause: maxlength exceeds the retriever's "
            f"bert.max_position_embeddings (out-of-range position lookup "
            f"fills with NaN).")


def embed_corpus(
    model: Retriever,
    params,
    sentences: Sequence[dict],   # [{"sentence": str, "id": int}]
    tokenizer,
    batch_size: int = 512,
    maxlength: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (ids (n,), embeddings (n, dim) float32) in input order.

    ``maxlength`` defaults to the retriever's ``passage_maxlength`` — the
    length it was TRAINED at (embedding at a different length is both a
    train/inference mismatch and, past the position table, NaN)."""
    if maxlength is None:
        maxlength = model.config.passage_maxlength
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
    out_ids, out_emb = np.concatenate(all_ids), np.concatenate(all_emb)
    _check_finite(out_emb, "corpus")
    return out_ids, out_emb


def embed_questions(
    model: Retriever,
    params,
    examples: Sequence[dict],    # reader-format: {"question", "caption", ...}
    tokenizer,
    batch_size: int = 512,
    maxlength: Optional[int] = None,
) -> np.ndarray:
    """Question+caption embeddings (reference prepends no prefix here —
    fact_retrieval.py embeds ``question + " " + caption``).

    ``maxlength`` defaults to the retriever's ``question_maxlength`` (the
    training length — see embed_corpus)."""
    if maxlength is None:
        maxlength = model.config.question_maxlength
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
    q_emb = np.concatenate(out)
    _check_finite(q_emb, "question")
    return q_emb
