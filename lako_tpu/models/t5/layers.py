"""T5 building blocks in flax.linen, shaped for the TPU MXU.

Architecture follows the original T5 (and its HF realization, which the reference
wraps at src/model.py:20-60): RMS layer norm, unscaled dot-product attention with
shared relative-position bias, relu or gated MLP. Compute dtype is configurable
(bfloat16 on TPU); softmax and layer-norm statistics accumulate in float32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lako_tpu.core.config import T5Config

Array = jax.Array

NEG_INF = -1e9


class RMSNorm(nn.Module):
    """T5 layer norm: scale-only RMS norm, no mean subtraction, fp32 accumulation."""

    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * weight.astype(self.dtype)


def relative_position_bucket(
    relative_position: Array,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> Array:
    """T5 relative-position bucketing (log-spaced beyond max_exact)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    """Learned bias over bucketed relative positions, computed once per stack and
    shared across all layers (equivalent to HF's first-layer-only bias)."""

    config: T5Config
    bidirectional: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qlen: int, klen: int, offset: int = 0) -> Array:
        cfg = self.config
        emb = self.param(
            "rel_embedding",
            nn.initializers.normal(stddev=cfg.d_model ** -0.5),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            jnp.float32,
        )
        context_position = jnp.arange(qlen)[:, None] + offset
        memory_position = jnp.arange(klen)[None, :]
        relative_position = memory_position - context_position  # (q, k)
        buckets = relative_position_bucket(
            relative_position,
            bidirectional=self.bidirectional,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        values = jnp.take(jnp.asarray(emb), buckets, axis=0)  # (q, k, heads)
        return jnp.transpose(values, (2, 0, 1))[None].astype(self.dtype)  # (1, h, q, k)


def _dense(features: int, dtype, name: str, init_std: float = 1.0):
    # T5 uses bias-free dense layers with fan-scaled normal init (the HF
    # _init_weights scheme); wrong init overflows bf16 activations at t5-large.
    return nn.Dense(features, use_bias=False, dtype=dtype, name=name,
                    kernel_init=nn.initializers.normal(stddev=init_std))


class T5Attention(nn.Module):
    """Multi-head attention, T5 flavor: no 1/sqrt(d) scaling (folded into init),
    fp32 softmax, additive bias (relative-position and/or mask) on the logits.

    Returns ``(output, logits, kv)`` — the pre-softmax logits are the capture
    point for FiD cross-attention distillation (replacing the reference's
    monkey-patched ``score_storage``, src/model.py:286-349).
    """

    config: T5Config
    dtype: Any = jnp.float32
    multiquery: bool = False  # FiDO-style: 1 shared K/V head (kv shape (B,1,K,d))

    def setup(self):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        kv_inner = cfg.d_kv if self.multiquery else inner
        # init matches T5: q absorbs the absent 1/sqrt(d_kv) attention scaling
        self.q = _dense(inner, self.dtype, "q", (cfg.d_model * cfg.d_kv) ** -0.5)
        self.k = _dense(kv_inner, self.dtype, "k", cfg.d_model ** -0.5)
        self.v = _dense(kv_inner, self.dtype, "v", cfg.d_model ** -0.5)
        self.o = _dense(cfg.d_model, self.dtype, "o", inner ** -0.5)
        self.dropout = nn.Dropout(rate=cfg.dropout_rate)

    def split_heads(self, x: Array) -> Array:
        b, l, _ = x.shape
        return x.reshape(b, l, self.config.num_heads, self.config.d_kv).transpose(0, 2, 1, 3)

    def split_kv_heads(self, x: Array) -> Array:
        b, l, _ = x.shape
        h = 1 if self.multiquery else self.config.num_heads
        return x.reshape(b, l, h, self.config.d_kv).transpose(0, 2, 1, 3)

    def merge_heads(self, x: Array) -> Array:
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    @staticmethod
    def _qk(q: Array, k: Array) -> Array:
        if k.shape[1] == q.shape[1]:
            return jnp.einsum("bhqd,bhkd->bhqk", q, k)
        return jnp.einsum("bhqd,bkd->bhqk", q, k[:, 0])  # multiquery broadcast

    @staticmethod
    def _pv(probs: Array, v: Array) -> Array:
        if v.shape[1] == probs.shape[1]:
            return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return jnp.einsum("bhqk,bkd->bhqd", probs, v[:, 0])

    def __call__(
        self,
        hidden: Array,
        kv: Optional[Array] = None,
        bias: Optional[Array] = None,
        *,
        deterministic: bool = True,
        cache: Optional[Tuple[Array, Array]] = None,
        cache_index: Optional[Array] = None,
        allow_fused: bool = False,
        stream_parts: Optional[Tuple[Array, Array]] = None,
    ):
        """bias: additive logits bias (1|B, heads|1, q, k) — already includes any
        key masking as NEG_INF. cache: (k, v) of shape (B, h, max_len, d) for
        incremental decoding; cache_index is the current write position.
        allow_fused: permit the Pallas fused path (no logits output).
        stream_parts: (rel_bias (h, q, k), key_mask (B, k)) — factored bias for
        the K-streamed kernel (long sequences); bias must be None then."""
        cfg = self.config
        q = self.split_heads(self.q(hidden))
        if cache is not None and kv is None:
            # incremental self-attention: write this step's k/v into the cache
            ck, cv = cache
            k_new = self.split_kv_heads(self.k(hidden))
            v_new = self.split_kv_heads(self.v(hidden))
            ck = jax.lax.dynamic_update_slice(ck, k_new.astype(ck.dtype), (0, 0, cache_index, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_new.astype(cv.dtype), (0, 0, cache_index, 0))
            k, v = ck, cv
        else:
            source = hidden if kv is None else kv
            k = self.split_kv_heads(self.k(source))
            v = self.split_kv_heads(self.v(source))

        if stream_parts is not None:
            import os

            from lako_tpu.ops.flash_streamed import streamed_attention

            assert bias is None and cache is None
            rel, key_mask = stream_parts
            interp = bool(os.environ.get("LAKO_FLASH_INTERPRET"))
            out = streamed_attention(q, k, v, rel, key_mask,
                                     cfg.flash_block_q, cfg.flash_block_k,
                                     interp)
            return self.o(self.merge_heads(out)), None, (k, v)

        if (allow_fused and cfg.use_flash_attention and cache is None
                and (deterministic or cfg.dropout_rate == 0.0)):
            from lako_tpu.ops.flash_attention import (
                fused_attention,
                supports_fused_attention,
            )

            if supports_fused_attention():
                out = fused_attention(q, k, v, bias)
                return self.o(self.merge_heads(out)), None, (k, v)

        logits = self._qk(q, k).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if not deterministic and cfg.dropout_rate > 0.0:
            probs = self.dropout(probs, deterministic=False)
        out = self._pv(probs, v)
        return self.o(self.merge_heads(out)), logits, (k, v)

    def attend_cached(self, hidden: Array, cross_kv: Tuple[Array, Array],
                      bias: Optional[Array]):
        """Cross-attention against precomputed K/V (incremental decode)."""
        q = self.split_heads(self.q(hidden))
        k, v = cross_kv
        logits = self._qk(q, k).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = self.o(self.merge_heads(self._pv(probs, v)))
        return out, logits

    def project_kv(self, enc: Array) -> Tuple[Array, Array]:
        return self.split_kv_heads(self.k(enc)), self.split_kv_heads(self.v(enc))


class T5MLP(nn.Module):
    config: T5Config
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        wi_std = cfg.d_model ** -0.5
        if cfg.is_gated_act:
            self.wi_0 = _dense(cfg.d_ff, self.dtype, "wi_0", wi_std)
            self.wi_1 = _dense(cfg.d_ff, self.dtype, "wi_1", wi_std)
        else:
            self.wi = _dense(cfg.d_ff, self.dtype, "wi", wi_std)
        self.wo = _dense(cfg.d_model, self.dtype, "wo", cfg.d_ff ** -0.5)
        self.dropout = nn.Dropout(rate=cfg.dropout_rate)

    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        cfg = self.config
        if cfg.is_gated_act:
            act = cfg.feed_forward_proj.removeprefix("gated-")
            h = getattr(jax.nn, act)(self.wi_0(x)) * self.wi_1(x)
        else:
            h = getattr(jax.nn, cfg.feed_forward_proj)(self.wi(x))
        if not deterministic and cfg.dropout_rate > 0.0:
            h = self.dropout(h, deterministic=False)
        return self.wo(h)


class T5EncoderBlock(nn.Module):
    config: T5Config
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.ln_attn = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, self.dtype, name="ln_attn")
        self.self_attn = T5Attention(cfg, self.dtype, name="self_attn")
        self.ln_mlp = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, self.dtype, name="ln_mlp")
        self.mlp = T5MLP(cfg, self.dtype, name="mlp")
        self.dropout = nn.Dropout(rate=cfg.dropout_rate)

    def __call__(self, x: Array, bias: Array, deterministic: bool = True,
                 stream_parts=None) -> Array:
        # NOTE: `deterministic` is positional so nn.remat can mark it static.
        cfg = self.config
        h, _, _ = self.self_attn(self.ln_attn(x), bias=bias,
                                 deterministic=deterministic, allow_fused=True,
                                 stream_parts=stream_parts)
        if not deterministic and cfg.dropout_rate > 0.0:
            h = self.dropout(h, deterministic=False)
        x = x + h
        h = self.mlp(self.ln_mlp(x), deterministic=deterministic)
        if not deterministic and cfg.dropout_rate > 0.0:
            h = self.dropout(h, deterministic=False)
        return x + h


class T5DecoderBlock(nn.Module):
    config: T5Config
    dtype: Any = jnp.float32
    has_cross: bool = True  # False under FiDO layer-sparse cross-attention

    def setup(self):
        cfg = self.config
        self.ln_self = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, self.dtype, name="ln_self")
        self.self_attn = T5Attention(cfg, self.dtype, name="self_attn")
        if self.has_cross:
            self.ln_cross = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, self.dtype, name="ln_cross")
            self.cross_attn = T5Attention(cfg, self.dtype,
                                          multiquery=cfg.multiquery_cross_attention,
                                          name="cross_attn")
        self.ln_mlp = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, self.dtype, name="ln_mlp")
        self.mlp = T5MLP(cfg, self.dtype, name="mlp")
        self.dropout = nn.Dropout(rate=cfg.dropout_rate)

    def __call__(
        self,
        x: Array,
        enc: Optional[Array],
        self_bias: Array,
        cross_bias: Optional[Array],
        *,
        deterministic: bool = True,
        self_cache: Optional[Tuple[Array, Array]] = None,
        cross_kv: Optional[Tuple[Array, Array]] = None,
        cache_index: Optional[Array] = None,
    ):
        """Returns (x, cross_logits, new_self_cache).

        cross_kv: precomputed encoder K/V for incremental decode (computed once,
        reused every step)."""
        cfg = self.config

        def drop(h):
            if deterministic or cfg.dropout_rate == 0.0:
                return h
            return self.dropout(h, deterministic=False)

        h, _, new_self_cache = self.self_attn(
            self.ln_self(x), bias=self_bias, deterministic=deterministic,
            cache=self_cache, cache_index=cache_index,
        )
        x = x + drop(h)

        if not self.has_cross:
            cross_logits = None
        elif cross_kv is not None:
            h, cross_logits = self.cross_attn.attend_cached(
                self.ln_cross(x), cross_kv, cross_bias
            )
            x = x + drop(h)
        else:
            h, cross_logits, _ = self.cross_attn(
                self.ln_cross(x), kv=enc, bias=cross_bias, deterministic=deterministic
            )
            x = x + drop(h)

        h = self.mlp(self.ln_mlp(x), deterministic=deterministic)
        return x + drop(h), cross_logits, new_self_cache


def mask_to_bias(mask: Array, dtype=jnp.float32) -> Array:
    """(..., k) boolean key mask → additive (..., 1, 1, k) bias."""
    return jnp.where(mask[:, None, None, :], 0.0, NEG_INF).astype(dtype)


def causal_bias(qlen: int, klen: int, offset: int = 0, dtype=jnp.float32) -> Array:
    q = jnp.arange(qlen)[:, None] + offset
    k = jnp.arange(klen)[None, :]
    return jnp.where(k <= q, 0.0, NEG_INF).astype(dtype)[None, None]
