"""LXMERT cross-modality encoder in flax.linen (TPU-native).

Re-implements the capability of the reference's LXMERT wrapper
(/root/reference/data_process/model/lxmert.py:6-85, which wraps HF
``LxmertForQuestionAnswering``): question text + Faster-RCNN obj36 visual
features (+ optional fact as a second text segment via token_type_ids) →
answer-candidate logits, with optional attention outputs. The reference runs
this offline on GPU through torch; here it is a first-class flax model so the
VQA-answering stage runs on TPU like everything else (the thin host-torch
adapter in models/lxmert_adapter.py remains as a fallback).

Architecture (HF lxmert-base: L=9 language / R=5 visual / X=5 cross layers,
post-LayerNorm, exact gelu):
  - BERT-style text embeddings (word + learned position + token type)
  - visual encoder: feats (B,36,2048) and normalized boxes (B,36,4) each
    through Dense+LayerNorm, averaged
  - modality-specific self-attention stacks, then X cross-modality layers:
    one SHARED cross-attention applied both directions (lang←visual and
    visual←lang), per-modality self-attention, per-modality FFN
  - pooler = tanh(dense([CLS])), QA head = Dense(H,2H)+gelu+LayerNorm+Dense

Weight import from HF torch checkpoints: models/lxmert/convert.py; numeric
parity pinned in tests/test_lxmert.py against transformers' torch model.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lako_tpu.core.config import LxmertConfig

Array = jax.Array

NEG_INF = -1e9


def _mask_bias(mask: Optional[Array], length: int, batch: int) -> Array:
    """(B, L) bool/int mask → (B, 1, 1, L) additive f32 bias."""
    if mask is None:
        return jnp.zeros((batch, 1, 1, length), jnp.float32)
    return jnp.where(mask[:, None, None, :].astype(bool), 0.0, NEG_INF)


class LxmertAttention(nn.Module):
    """Multi-head attention over a (possibly different-modality) context.

    Mirrors HF LxmertAttention: q from ``hidden``, k/v from ``context``,
    1/sqrt(d) scaling, additive mask bias.
    """

    config: LxmertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                      kernel_init=init, name=name)
        self.query, self.key, self.value = (dense("query"), dense("key"),
                                            dense("value"))
        self.attn_dropout = nn.Dropout(rate=cfg.attention_probs_dropout_prob)

    def __call__(self, hidden: Array, context: Array, bias: Array, *,
                 deterministic: bool = True, return_probs: bool = False):
        cfg = self.config
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        B, Lq, _ = hidden.shape
        Lk = context.shape[1]

        q = self.query(hidden).reshape(B, Lq, h, d).transpose(0, 2, 1, 3)
        k = self.key(context).reshape(B, Lk, h, d).transpose(0, 2, 1, 3)
        v = self.value(context).reshape(B, Lk, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits / (d ** 0.5) + bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if not deterministic:
            probs = self.attn_dropout(probs, deterministic=False)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Lq, h * d)
        return (ctx, probs) if return_probs else (ctx, None)


class LxmertAttentionOutput(nn.Module):
    config: LxmertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.dense = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                              kernel_init=nn.initializers.normal(stddev=0.02),
                              name="dense")
        self.layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name="layer_norm")
        self.dropout = nn.Dropout(rate=cfg.hidden_dropout_prob)

    def __call__(self, x: Array, residual: Array, *,
                 deterministic: bool = True) -> Array:
        x = self.dense(x)
        if not deterministic:
            x = self.dropout(x, deterministic=False)
        return self.layer_norm(x + residual)


class LxmertFFN(nn.Module):
    config: LxmertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        self.intermediate = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                                     kernel_init=init, name="intermediate")
        self.output = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                               kernel_init=init, name="output")
        self.layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name="layer_norm")
        self.dropout = nn.Dropout(rate=cfg.hidden_dropout_prob)

    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        h = self.output(jax.nn.gelu(self.intermediate(x), approximate=False))
        if not deterministic:
            h = self.dropout(h, deterministic=False)
        return self.layer_norm(h + x)


class LxmertSelfLayer(nn.Module):
    """Self-attention + FFN block (language or visual stack)."""

    config: LxmertConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.attention = LxmertAttention(self.config, self.dtype,
                                         name="attention")
        self.att_output = LxmertAttentionOutput(self.config, self.dtype,
                                                name="att_output")
        self.ffn = LxmertFFN(self.config, self.dtype, name="ffn")

    def __call__(self, x: Array, bias: Array, *,
                 deterministic: bool = True) -> Array:
        ctx, _ = self.attention(x, x, bias, deterministic=deterministic)
        x = self.att_output(ctx, x, deterministic=deterministic)
        return self.ffn(x, deterministic=deterministic)


class LxmertXLayer(nn.Module):
    """Cross-modality layer: one shared cross-attention applied in BOTH
    directions (matching HF, where self.visual_attention is reused), then
    per-modality self-attention and FFN."""

    config: LxmertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        # ONE cross-attention (projections AND output dense+LN) shared by
        # both directions, matching HF's reused `visual_attention` module
        self.cross_attention = LxmertAttention(cfg, self.dtype,
                                               name="cross_attention")
        self.cross_output = LxmertAttentionOutput(cfg, self.dtype,
                                                  name="cross_output")
        self.lang_self = LxmertSelfLayer(cfg, self.dtype, name="lang_self")
        self.visn_self = LxmertSelfLayer(cfg, self.dtype, name="visn_self")

    def __call__(self, lang: Array, lang_bias: Array, visn: Array,
                 visn_bias: Array, *, deterministic: bool = True,
                 return_probs: bool = False):
        l_ctx, l_probs = self.cross_attention(
            lang, visn, visn_bias, deterministic=deterministic,
            return_probs=return_probs)
        v_ctx, _ = self.cross_attention(visn, lang, lang_bias,
                                        deterministic=deterministic)
        lang = self.cross_output(l_ctx, lang, deterministic=deterministic)
        visn = self.cross_output(v_ctx, visn, deterministic=deterministic)
        lang = self.lang_self(lang, lang_bias, deterministic=deterministic)
        visn = self.visn_self(visn, visn_bias, deterministic=deterministic)
        return lang, visn, l_probs


class LxmertEmbeddings(nn.Module):
    config: LxmertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        embedding_init=init, dtype=self.dtype,
                                        name="word_embeddings")
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, embedding_init=init,
            dtype=self.dtype, name="position_embeddings")
        self.token_type_embeddings = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, embedding_init=init,
            dtype=self.dtype, name="token_type_embeddings")
        self.layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                       name="layer_norm")
        self.dropout = nn.Dropout(rate=self.config.hidden_dropout_prob)

    def __call__(self, input_ids: Array,
                 token_type_ids: Optional[Array] = None, *,
                 deterministic: bool = True) -> Array:
        L = input_ids.shape[1]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(jnp.arange(L)[None, :])
             + self.token_type_embeddings(token_type_ids))
        x = self.layer_norm(x)
        if not deterministic:
            x = self.dropout(x, deterministic=False)
        return x


class LxmertVisualEncoder(nn.Module):
    config: LxmertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        self.visn_fc = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                kernel_init=init, name="visn_fc")
        self.visn_layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                            name="visn_layer_norm")
        self.box_fc = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                               kernel_init=init, name="box_fc")
        self.box_layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                           name="box_layer_norm")
        self.dropout = nn.Dropout(rate=cfg.hidden_dropout_prob)

    def __call__(self, feats: Array, boxes: Array, *,
                 deterministic: bool = True) -> Array:
        x = self.visn_layer_norm(self.visn_fc(feats))
        y = self.box_layer_norm(self.box_fc(boxes))
        out = (x + y) / 2
        if not deterministic:
            out = self.dropout(out, deterministic=False)
        return out


class LxmertModel(nn.Module):
    """Returns (lang_hidden (B,L,H), visn_hidden (B,36,H), pooled (B,H)).

    Optionally also the per-X-layer lang→visual cross-attention probs
    (the reference's output_attention path, lxmert.py:64-84)."""

    config: LxmertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.embeddings = LxmertEmbeddings(cfg, self.dtype, name="embeddings")
        self.visual_encoder = LxmertVisualEncoder(cfg, self.dtype,
                                                  name="visual_encoder")
        self.lang_layers = [LxmertSelfLayer(cfg, self.dtype, name=f"lang_{i}")
                            for i in range(cfg.l_layers)]
        self.visn_layers = [LxmertSelfLayer(cfg, self.dtype, name=f"visn_{i}")
                            for i in range(cfg.r_layers)]
        self.x_layers = [LxmertXLayer(cfg, self.dtype, name=f"x_{i}")
                         for i in range(cfg.x_layers)]
        self.pooler = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                               kernel_init=nn.initializers.normal(stddev=0.02),
                               name="pooler")

    def __call__(self, input_ids: Array, visual_feats: Array,
                 visual_pos: Array, attention_mask: Optional[Array] = None,
                 token_type_ids: Optional[Array] = None,
                 visual_mask: Optional[Array] = None, *,
                 deterministic: bool = True, output_attentions: bool = False):
        B, L = input_ids.shape
        V = visual_feats.shape[1]
        lang_bias = _mask_bias(attention_mask, L, B)
        visn_bias = _mask_bias(visual_mask, V, B)

        lang = self.embeddings(input_ids, token_type_ids,
                               deterministic=deterministic)
        visn = self.visual_encoder(visual_feats, visual_pos,
                                   deterministic=deterministic)
        for layer in self.lang_layers:
            lang = layer(lang, lang_bias, deterministic=deterministic)
        for layer in self.visn_layers:
            visn = layer(visn, visn_bias, deterministic=deterministic)
        cross_probs = []
        for layer in self.x_layers:
            lang, visn, probs = layer(lang, lang_bias, visn, visn_bias,
                                      deterministic=deterministic,
                                      return_probs=output_attentions)
            if output_attentions:
                cross_probs.append(probs)
        pooled = jnp.tanh(self.pooler(lang[:, 0]))
        if output_attentions:
            return lang, visn, pooled, cross_probs
        return lang, visn, pooled


class LxmertForQA(nn.Module):
    """LxmertModel + the 2-layer gelu QA head over the pooled output
    (HF LxmertForQuestionAnswering / reference lxmert.py:66-76)."""

    config: LxmertConfig
    num_labels: int
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        self.lxmert = LxmertModel(cfg, self.dtype, name="lxmert")
        self.qa_dense = nn.Dense(cfg.hidden_size * 2, dtype=self.dtype,
                                 kernel_init=init, name="qa_dense")
        self.qa_layer_norm = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                          name="qa_layer_norm")
        self.qa_logits = nn.Dense(self.num_labels, dtype=self.dtype,
                                  kernel_init=init, name="qa_logits")

    def __call__(self, input_ids: Array, visual_feats: Array,
                 visual_pos: Array, attention_mask: Optional[Array] = None,
                 token_type_ids: Optional[Array] = None, *,
                 deterministic: bool = True, output_attentions: bool = False):
        out = self.lxmert(input_ids, visual_feats, visual_pos,
                          attention_mask, token_type_ids,
                          deterministic=deterministic,
                          output_attentions=output_attentions)
        pooled = out[2]
        h = jax.nn.gelu(self.qa_dense(pooled), approximate=False)
        logits = self.qa_logits(self.qa_layer_norm(h))
        if output_attentions:
            return logits, out[3]
        return logits
