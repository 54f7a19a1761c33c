"""BERT encoder in flax.linen (post-LayerNorm transformer).

Backbone for the bi-encoder retriever (reference: transformers.BertModel used at
src/model.py:385-387). Scaled dot-product attention (1/sqrt(d_kv)), learned
absolute position embeddings, gelu MLP.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lako_tpu.core.config import BertConfig

Array = jax.Array

NEG_INF = -1e9


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        embedding_init=init, dtype=self.dtype,
                                        name="word_embeddings")
        self.position_embeddings = nn.Embed(cfg.max_position_embeddings,
                                            cfg.hidden_size, embedding_init=init,
                                            dtype=self.dtype,
                                            name="position_embeddings")
        self.token_type_embeddings = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                                              embedding_init=init, dtype=self.dtype,
                                              name="token_type_embeddings")
        self.layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                       name="layer_norm")
        self.dropout = nn.Dropout(rate=cfg.hidden_dropout_prob)

    def __call__(self, input_ids: Array, token_type_ids: Optional[Array] = None,
                 *, deterministic: bool = True) -> Array:
        L = input_ids.shape[1]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        positions = jnp.arange(L)[None, :]
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(positions)
             + self.token_type_embeddings(token_type_ids))
        x = self.layer_norm(x)
        if not deterministic:
            x = self.dropout(x, deterministic=False)
        return x


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name,
                                      kernel_init=init)
        self.query, self.key, self.value = dense("query"), dense("key"), dense("value")
        self.out = dense("out")
        self.out_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                           dtype=self.dtype, name="out_layer_norm")
        self.attn_dropout = nn.Dropout(rate=cfg.attention_probs_dropout_prob)
        self.out_dropout = nn.Dropout(rate=cfg.hidden_dropout_prob)

    def __call__(self, x: Array, bias: Array, *, deterministic: bool = True) -> Array:
        cfg = self.config
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        B, L, _ = x.shape

        def split(t):
            return t.reshape(B, L, h, d).transpose(0, 2, 1, 3)

        q, k, v = split(self.query(x)), split(self.key(x)), split(self.value(x))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits / (d ** 0.5) + bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if not deterministic:
            probs = self.attn_dropout(probs, deterministic=False)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, h * d)
        out = self.out(ctx)
        if not deterministic:
            out = self.out_dropout(out, deterministic=False)
        return self.out_layer_norm(out + x)


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        self.attention = BertSelfAttention(cfg, self.dtype, name="attention")
        self.intermediate = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                                     kernel_init=init, name="intermediate")
        self.output = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init,
                               name="output")
        self.output_layer_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                              dtype=self.dtype,
                                              name="output_layer_norm")
        self.dropout = nn.Dropout(rate=cfg.hidden_dropout_prob)

    def __call__(self, x: Array, bias: Array, *, deterministic: bool = True) -> Array:
        cfg = self.config
        x = self.attention(x, bias, deterministic=deterministic)
        act = {"gelu": jax.nn.gelu}.get(cfg.hidden_act, getattr(jax.nn, cfg.hidden_act))
        h = self.output(act(self.intermediate(x), approximate=False)
                        if cfg.hidden_act == "gelu" else act(self.intermediate(x)))
        if not deterministic:
            h = self.dropout(h, deterministic=False)
        return self.output_layer_norm(h + x)


class BertEncoder(nn.Module):
    """Returns the sequence of hidden states (HF BertModel.last_hidden_state)."""

    config: BertConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg, self.dtype, name="embeddings")
        self.layers = [BertLayer(cfg, self.dtype, name=f"layer_{i}")
                       for i in range(cfg.num_hidden_layers)]

    def __call__(self, input_ids: Array, attention_mask: Optional[Array] = None,
                 token_type_ids: Optional[Array] = None,
                 *, deterministic: bool = True) -> Array:
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids, dtype=bool)
        bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
        x = self.embeddings(input_ids, token_type_ids, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        return x
