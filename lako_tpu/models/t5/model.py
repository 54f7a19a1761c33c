"""T5 encoder/decoder stacks and the Fusion-in-Decoder reader.

FiD semantics follow the reference (src/model.py:20-60, 216-234): N passages per
example are encoded independently (encoder attention is per-passage, O(N·L²) not
O((N·L)²)), then the decoder cross-attends over the concatenated encoder states.
Here that is a plain reshape around a vmappable encoder — no wrapper classes, no
``n_passages`` mutation — and the "capture cross-attention scores" hack
(src/model.py:206-213, 286-349) is a first-class aux output of ``__call__``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.layers import (
    NEG_INF,
    RelativePositionBias,
    RMSNorm,
    T5DecoderBlock,
    T5EncoderBlock,
    causal_bias,
    mask_to_bias,
)

Array = jax.Array


def resolve_remat_policy(name):
    """Remat policy knob: None/'full' = recompute everything in the backward
    (min memory, ~8PT FLOPs/step); 'dots' = save matmul outputs and recompute
    only the cheap elementwise ops (jax.checkpoint_policies
    .dots_with_no_batch_dims_saveable — closer to 6PT at higher activation
    memory).

    MEASURED (v5e-1, t5-large FiD train step, B=32 N=2 L=128, donated
    state): full remat 151.5 ms/step, 'dots' 161.9 ms (the saved-activation
    HBM writes cost more than the recompute they avoid), NO remat also
    151.5 ms — the step is not remat-bound at this shape, so 'full' stays
    the default and the knob matters only for bigger models/longer L.

    Applies to the ENCODER blocks only (FiD's decoder pass is the short
    teacher-forced answer sequence and is never remat'd). Reachable via
    ReaderTrainConfig.remat_policy."""
    if name in (None, "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat policy {name!r}")


class T5Encoder(nn.Module):
    config: T5Config
    dtype: Any = jnp.float32
    use_remat: bool = False
    remat_policy: Any = None    # None/'full' | 'dots'

    def setup(self):
        cfg = self.config
        self.relpos = RelativePositionBias(cfg, bidirectional=True, dtype=self.dtype,
                                           name="relpos")
        block_cls = T5EncoderBlock
        if self.use_remat:
            # static_argnums counts self as 0: (x=1, bias=2, deterministic=3)
            block_cls = nn.remat(T5EncoderBlock, static_argnums=(3,),
                                 prevent_cse=False,
                                 policy=resolve_remat_policy(self.remat_policy))
        self.blocks = [
            block_cls(cfg, self.dtype, name=f"block_{i}") for i in range(cfg.num_layers)
        ]
        self.final_ln = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, self.dtype,
                                name="final_ln")
        self.hidden_dropout = nn.Dropout(rate=cfg.dropout_rate)

    def _use_streamed_flash(self, L: int, deterministic: bool) -> bool:
        import os

        cfg = self.config
        if not (cfg.use_flash_attention and L >= cfg.flash_min_length):
            return False
        if not deterministic and cfg.dropout_rate > 0.0:
            return False
        if os.environ.get("LAKO_FLASH_INTERPRET"):
            return True
        from lako_tpu.ops.flash_attention import supports_fused_attention

        return supports_fused_attention()

    def __call__(self, embeds: Array, mask: Array, *, deterministic: bool = True) -> Array:
        """embeds: (B, L, H) token embeddings; mask: (B, L) bool."""
        cfg = self.config
        L = embeds.shape[1]
        x = embeds
        if not deterministic and cfg.dropout_rate > 0.0:
            x = self.hidden_dropout(x, deterministic=False)
        if self._use_streamed_flash(L, deterministic):
            # K-streamed kernel path: factored bias, the (B,h,L,L) additive
            # tensor is never materialized (ops/flash_streamed.py)
            rel = self.relpos(L, L)[0]                   # (h, L, L)
            for block in self.blocks:
                x = block(x, None, deterministic, (rel, mask))
        else:
            bias = self.relpos(L, L) + mask_to_bias(mask)
            for block in self.blocks:
                x = block(x, bias, deterministic)
        x = self.final_ln(x)
        if not deterministic and cfg.dropout_rate > 0.0:
            x = self.hidden_dropout(x, deterministic=False)
        return x


class T5Decoder(nn.Module):
    config: T5Config
    dtype: Any = jnp.float32
    use_remat: bool = False

    def setup(self):
        cfg = self.config
        self.relpos = RelativePositionBias(cfg, bidirectional=False, dtype=self.dtype,
                                           name="relpos")
        self.blocks = [
            T5DecoderBlock(cfg, self.dtype, has_cross=cfg.has_cross_attention(i),
                           name=f"block_{i}")
            for i in range(cfg.num_decoder_layers)
        ]
        self.final_ln = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, self.dtype,
                                name="final_ln")
        self.hidden_dropout = nn.Dropout(rate=cfg.dropout_rate)

    def __call__(
        self,
        embeds: Array,
        enc: Array,
        enc_mask: Array,
        *,
        self_mask: Optional[Array] = None,
        deterministic: bool = True,
        collect_cross_logits: bool = False,
    ):
        """Teacher-forcing decode.

        embeds: (B, T, H); enc: (B, K, H); enc_mask: (B, K) bool.
        Returns (hidden (B,T,H), cross_logits (B, layers, heads, T, K) or None).
        """
        cfg = self.config
        T = embeds.shape[1]
        self_bias = self.relpos(T, T) + causal_bias(T, T)
        if self_mask is not None:
            self_bias = self_bias + mask_to_bias(self_mask)
        cross_bias = mask_to_bias(enc_mask)
        x = embeds
        if not deterministic and cfg.dropout_rate > 0.0:
            x = self.hidden_dropout(x, deterministic=False)
        cross_logits = []
        for block in self.blocks:
            x, xl, _ = block(x, enc, self_bias, cross_bias, deterministic=deterministic)
            if collect_cross_logits and xl is not None:
                cross_logits.append(xl)
        x = self.final_ln(x)
        if not deterministic and cfg.dropout_rate > 0.0:
            x = self.hidden_dropout(x, deterministic=False)
        stacked = jnp.stack(cross_logits, axis=1) if collect_cross_logits else None
        return x, stacked

    def init_cache(self, batch: int, max_len: int, enc: Array):
        """Build (self_caches, cross_kvs): per-layer KV buffers for incremental
        decode. Cross K/V are computed once from the encoder states."""
        cfg = self.config
        h, d = cfg.num_heads, cfg.d_kv
        self_caches = []
        cross_kvs = []
        for block in self.blocks:
            zeros = jnp.zeros((batch, h, max_len, d), dtype=self.dtype)
            self_caches.append((zeros, zeros))
            cross_kvs.append(block.cross_attn.project_kv(enc)
                             if block.has_cross else None)
        return self_caches, cross_kvs

    def decode_biases(self, enc_mask: Array, max_len: int):
        """Loop-invariant decode inputs, computed once per generate call:
        full (1, h, max_len, max_len) self-attention relpos bias and the
        cross-attention key-mask bias."""
        return self.relpos(max_len, max_len), mask_to_bias(enc_mask)

    def decode_step(
        self,
        embeds: Array,
        self_bias_full: Array,
        cross_bias: Array,
        self_caches,
        cross_kvs,
        step: Array,
        max_len: int,
        *,
        collect_cross_logits: bool = False,
    ):
        """One incremental step. embeds: (B, 1, H). step: scalar int index.
        self_bias_full / cross_bias come from :meth:`decode_biases` (hoisted out
        of the token loop — loop-invariant work stays out of the scan body).

        Returns (hidden (B,1,H), cross_logits (B,layers,heads,K)|None, new_caches).
        """
        cfg = self.config
        row = jax.lax.dynamic_slice_in_dim(self_bias_full, step, 1, axis=2)  # (1,h,1,K)
        valid = (jnp.arange(max_len) <= step)[None, None, None, :]
        row = jnp.where(valid, row, NEG_INF)
        x = embeds
        new_caches = []
        cross_logits = []
        for block, cache, ckv in zip(self.blocks, self_caches, cross_kvs):
            x, xl, new_cache = block(
                x, None, row, cross_bias,
                deterministic=True,
                self_cache=cache,
                cross_kv=ckv,
                cache_index=step,
            )
            new_caches.append(new_cache)
            if collect_cross_logits and xl is not None:
                cross_logits.append(xl[:, :, 0, :])  # (B, heads, K)
        x = self.final_ln(x)
        stacked = jnp.stack(cross_logits, axis=1) if collect_cross_logits else None
        return x, stacked, new_caches


class T5(nn.Module):
    """Plain T5 conditional generation model (single-passage)."""

    config: T5Config
    dtype: Any = jnp.float32
    use_remat: bool = False
    remat_policy: Any = None

    def setup(self):
        cfg = self.config
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model,
                               embedding_init=nn.initializers.normal(stddev=1.0),
                               dtype=self.dtype, name="shared")
        self.encoder = T5Encoder(cfg, self.dtype, self.use_remat,
                                 self.remat_policy, name="encoder")
        self.decoder = T5Decoder(cfg, self.dtype, self.use_remat, name="decoder")
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype,
                                    name="lm_head")

    def logits_from_hidden(self, hidden: Array) -> Array:
        cfg = self.config
        if cfg.tie_word_embeddings:
            hidden = hidden * (cfg.d_model ** -0.5)
            return self.shared.attend(hidden)
        return self.lm_head(hidden)

    def encode(self, input_ids: Array, mask: Array, *, deterministic: bool = True) -> Array:
        return self.encoder(self.shared(input_ids), mask, deterministic=deterministic)

    def decode(
        self, decoder_input_ids: Array, enc: Array, enc_mask: Array,
        *, deterministic: bool = True, collect_cross_logits: bool = False,
    ):
        hidden, xl = self.decoder(
            self.shared(decoder_input_ids), enc, enc_mask,
            deterministic=deterministic, collect_cross_logits=collect_cross_logits,
        )
        return self.logits_from_hidden(hidden), xl

    def __call__(
        self, input_ids: Array, mask: Array, decoder_input_ids: Array,
        *, deterministic: bool = True, collect_cross_logits: bool = False,
    ):
        enc = self.encode(input_ids, mask, deterministic=deterministic)
        return self.decode(
            decoder_input_ids, enc, mask,
            deterministic=deterministic, collect_cross_logits=collect_cross_logits,
        )


def shift_right(labels: Array, decoder_start_token_id: int, pad_id: int = 0) -> Array:
    """Build decoder inputs from labels (T5 convention); -100 label slots → pad."""
    shifted = jnp.roll(labels, 1, axis=-1).at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_id, shifted)


class FiDT5(nn.Module):
    """Fusion-in-Decoder T5 over fixed-shape (B, N, L) passage batches."""

    config: T5Config
    dtype: Any = jnp.float32
    use_remat: bool = False
    remat_policy: Any = None    # None/'full' | 'dots' (resolve_remat_policy)

    def setup(self):
        self.t5 = T5(self.config, self.dtype, self.use_remat,
                     self.remat_policy, name="t5")

    def encode_passages(self, input_ids: Array, mask: Array,
                        *, deterministic: bool = True) -> Tuple[Array, Array]:
        """(B, N, L) → encoder states (B, N·L, H) and flattened mask (B, N·L).

        The reshape to (B·N, L) is the idiomatic rewrite of the reference's
        EncoderWrapper (src/model.py:227-234): per-passage encoding is just a
        bigger batch to the MXU, and XLA parallelizes it with zero glue.
        """
        B, N, L = input_ids.shape
        flat_ids = input_ids.reshape(B * N, L)
        flat_mask = mask.reshape(B * N, L)
        enc = self.t5.encode(flat_ids, flat_mask, deterministic=deterministic)
        H = enc.shape[-1]
        return enc.reshape(B, N * L, H), mask.reshape(B, N * L)

    def __call__(
        self,
        input_ids: Array,      # (B, N, L)
        mask: Array,           # (B, N, L) bool
        labels: Array,         # (B, T) with -100 on pad
        *,
        deterministic: bool = True,
        collect_cross_logits: bool = False,
    ):
        """Returns (loss, logits, cross_logits|None).

        cross_logits: (B, layers, heads, T, N·L) pre-softmax decoder cross-attention
        logits — the distillation signal (replaces score_storage).
        """
        cfg = self.config
        enc, enc_mask = self.encode_passages(input_ids, mask, deterministic=deterministic)
        dec_in = shift_right(labels, cfg.decoder_start_token_id, cfg.pad_token_id)
        logits, xl = self.t5.decode(
            dec_in, enc, enc_mask,
            deterministic=deterministic, collect_cross_logits=collect_cross_logits,
        )
        valid = labels != -100
        safe_labels = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
        # Mean over all valid tokens (matches torch CrossEntropyLoss(ignore_index=-100))
        loss = -(token_ll * valid).sum() / jnp.maximum(valid.sum(), 1)
        return loss, logits, xl
