"""BERT bi-encoder retriever with cross-attention distillation loss.

Reference semantics (src/model.py:352-483): shared projection + LayerNorm down to
``indexing_dimension`` (or asymmetric question/fact heads), masked mean-pooling or
CLS extraction, inner-product scores scaled by 1/sqrt(dim), and KL-divergence loss
between log-softmax scores and gold (attention-derived) probabilities, matching
torch ``KLDivLoss`` elementwise-mean reduction.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lako_tpu.core.config import RetrieverConfig
from lako_tpu.models.bert.model import BertEncoder

Array = jax.Array


class Retriever(nn.Module):
    config: RetrieverConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        self.bert = BertEncoder(cfg.bert, self.dtype, name="bert")
        if cfg.projection:
            self.proj = nn.Dense(cfg.indexing_dimension, dtype=self.dtype,
                                 kernel_init=init, name="proj")
            self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        elif cfg.asymmetric:
            self.proj_iq = nn.Dense(cfg.indexing_dimension, dtype=self.dtype,
                                    kernel_init=init, name="proj_iq")
            self.proj_fact = nn.Dense(cfg.indexing_dimension, dtype=self.dtype,
                                      kernel_init=init, name="proj_fact")
            self.norm_iq = nn.LayerNorm(dtype=self.dtype, name="norm_iq")
            self.norm_fact = nn.LayerNorm(dtype=self.dtype, name="norm_fact")

    def embed_text(self, text_ids: Array, text_mask: Array, text_type: str = "q",
                   *, apply_mask: bool = True, extract_cls: bool = False,
                   deterministic: bool = True) -> Array:
        """(B, L) ids → (B, D) embeddings (reference embed_text, src/model.py:451-478)."""
        cfg = self.config
        hidden = self.bert(text_ids, text_mask if apply_mask else None,
                           deterministic=deterministic)
        if cfg.projection:
            hidden = self.norm(self.proj(hidden))
        elif cfg.asymmetric:
            if text_type == "q":
                hidden = self.norm_iq(self.proj_iq(hidden))
            else:
                hidden = self.norm_fact(self.proj_fact(hidden))
        if extract_cls:
            return hidden[:, 0]
        if apply_mask:
            m = text_mask[:, :, None].astype(hidden.dtype)
            return (hidden * m).sum(axis=1) / jnp.maximum(
                text_mask.sum(axis=1)[:, None], 1
            ).astype(hidden.dtype)
        return hidden.mean(axis=1)

    def __call__(
        self,
        question_ids: Array,    # (B, Lq)
        question_mask: Array,   # (B, Lq)
        passage_ids: Array,     # (B, n, Lp)
        passage_mask: Array,    # (B, n, Lp)
        gold_score: Optional[Array] = None,  # (B, n) probabilities
        *,
        deterministic: bool = True,
    ) -> Tuple[Array, Array, Array, Optional[Array]]:
        """Returns (question_emb, passage_emb, score, loss|None)."""
        cfg = self.config
        B, n, Lp = passage_ids.shape
        # questions and passages are row-independent through BERT; when they
        # share the projection head, mask policy, and sequence length, run
        # them as ONE batched call — at the reference config (B=8, n=10)
        # this turns an 8-row GEMM chain + an 80-row one into a single
        # 88-row pass (measured +4.5% step throughput, bench_retriever_train)
        fuse = (not cfg.asymmetric
                and cfg.apply_question_mask == cfg.apply_passage_mask
                and question_ids.shape[1] == Lp)
        if fuse:
            all_ids = jnp.concatenate(
                [question_ids, passage_ids.reshape(B * n, Lp)], axis=0)
            all_mask = jnp.concatenate(
                [question_mask, passage_mask.reshape(B * n, Lp)], axis=0)
            all_emb = self.embed_text(
                all_ids, all_mask, "q",
                apply_mask=cfg.apply_question_mask,
                extract_cls=cfg.extract_cls, deterministic=deterministic,
            )
            q_emb, p_emb = all_emb[:B], all_emb[B:]
        else:
            q_emb = self.embed_text(
                question_ids, question_mask, "q",
                apply_mask=cfg.apply_question_mask, extract_cls=cfg.extract_cls,
                deterministic=deterministic,
            )
            p_emb = self.embed_text(
                passage_ids.reshape(B * n, Lp), passage_mask.reshape(B * n, Lp), "f",
                apply_mask=cfg.apply_passage_mask, extract_cls=cfg.extract_cls,
                deterministic=deterministic,
            )
        score = jnp.einsum("bd,bid->bi", q_emb, p_emb.reshape(B, n, -1))
        score = score / (q_emb.shape[-1] ** 0.5)
        loss = None
        if gold_score is not None:
            loss = kl_div_loss(score, gold_score)
        return q_emb, p_emb, score, loss


def kl_div_loss(score: Array, gold: Array) -> Array:
    """torch.nn.KLDivLoss()(log_softmax(score), gold): elementwise
    ``gold * (log(gold) - log_p)`` with 0-target terms defined as 0, averaged over
    ALL elements (torch 'mean' reduction quirk, reference src/model.py:409,480-483)."""
    logp = jax.nn.log_softmax(score.astype(jnp.float32), axis=-1)
    gold = gold.astype(jnp.float32)
    pointwise = jnp.where(gold > 0, gold * (jnp.log(jnp.maximum(gold, 1e-30)) - logp), 0.0)
    return pointwise.mean()
