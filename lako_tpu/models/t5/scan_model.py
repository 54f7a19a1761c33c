"""Scan-over-layers FiD T5 training forward — O(1) compile scaling.

The flax ``FiDT5`` unrolls its blocks in the traced program: compile time and
program size grow linearly with depth (fine at t5-large, painful at t5-3b/11b).
This module computes the SAME training loss via ``lax.scan`` over stacked
layer weights — one traced layer body each for the encoder and decoder —
so the compiled program's size is independent of depth (verified by a
jaxpr-size test). Parameters stay in the standard FiDT5 tree (checkpoints,
the HF importer, and the TP partition specs all keep working); stacking
happens inside the jitted step and is a cheap device-side reshape.

Per-layer rematerialization comes from ``jax.checkpoint`` on the scan body
(``remat=True``) — the idiomatic scan+remat pairing for long stacks — and
training dropout derives per-layer streams with ``jax.random.fold_in``.
With dropout off the loss/logits/grads match ``FiDT5.apply`` exactly
(tests/test_scan_model.py); with dropout on, every flax dropout SITE is
mirrored (embeddings, attention probs, attn output, mlp inner pre-wo, mlp
output, final hidden — 4 sub-streams per encoder layer, 6 per decoder
layer) but the rng STREAMS differ from the unrolled module's (same
distribution, different draws) — not a parity break, since rng placement
is an implementation detail.

Reference parity: same computation as src/model.py's FiDT5 training forward
(reshape trick src/model.py:227-234, CE loss train_reader.py) — this is a
compile-scaling variant, not a new model.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.layers import (causal_bias, mask_to_bias,
                                       relative_position_bucket)
from lako_tpu.models.t5.model import shift_right
from lako_tpu.parallel.pipeline import (_apply_block, _rms,
                                        stack_encoder_blocks)

Array = jax.Array


class StackedDecoderBlocks(NamedTuple):
    """Decoder block weights with a leading (num_decoder_layers,) axis."""

    ln_self: Array
    sq: Array
    sk: Array
    sv: Array
    so: Array
    ln_cross: Array
    cq: Array
    ck: Array
    cv: Array
    co: Array
    ln_mlp: Array
    wi: Optional[Array]
    wi_0: Optional[Array]
    wi_1: Optional[Array]
    wo_mlp: Array


def stack_decoder_blocks(params, cfg: T5Config,
                         dtype=jnp.float32) -> StackedDecoderBlocks:
    dec = params["t5"]["decoder"]
    L = cfg.num_decoder_layers
    if not all(cfg.has_cross_attention(i) for i in range(L)):
        raise ValueError("scan decoder requires homogeneous layers "
                         "(cross_attention_stride unset)")
    if cfg.multiquery_cross_attention:
        raise ValueError("scan decoder does not support multiquery "
                         "cross-attention (use the flax FiDT5)")

    def stack(fn):
        return jnp.stack([jnp.asarray(fn(dec[f"block_{i}"]), dtype=dtype)
                          for i in range(L)])

    gated = cfg.is_gated_act
    return StackedDecoderBlocks(
        ln_self=stack(lambda b: b["ln_self"]["weight"]),
        sq=stack(lambda b: b["self_attn"]["q"]["kernel"]),
        sk=stack(lambda b: b["self_attn"]["k"]["kernel"]),
        sv=stack(lambda b: b["self_attn"]["v"]["kernel"]),
        so=stack(lambda b: b["self_attn"]["o"]["kernel"]),
        ln_cross=stack(lambda b: b["ln_cross"]["weight"]),
        cq=stack(lambda b: b["cross_attn"]["q"]["kernel"]),
        ck=stack(lambda b: b["cross_attn"]["k"]["kernel"]),
        cv=stack(lambda b: b["cross_attn"]["v"]["kernel"]),
        co=stack(lambda b: b["cross_attn"]["o"]["kernel"]),
        ln_mlp=stack(lambda b: b["ln_mlp"]["weight"]),
        wi=None if gated else stack(lambda b: b["mlp"]["wi"]["kernel"]),
        wi_0=stack(lambda b: b["mlp"]["wi_0"]["kernel"]) if gated else None,
        wi_1=stack(lambda b: b["mlp"]["wi_1"]["kernel"]) if gated else None,
        wo_mlp=stack(lambda b: b["mlp"]["wo"]["kernel"]),
    )


def _attend(x_q, x_kv, wq, wk, wv, wo, bias, cfg, dtype, hk=None,
            probs_drop=None):
    """Unscaled T5 multi-head attention over full sequences.
    ``probs_drop`` mirrors the flax path's attention-probability dropout
    (layers.py:213-214)."""
    h, d = cfg.num_heads, cfg.d_kv
    B, Lq, _ = x_q.shape
    Lk = x_kv.shape[1]
    split = lambda t, n: t.reshape(B, -1, n, d).transpose(0, 2, 1, 3)
    q = split(x_q @ wq, h)
    k = split(x_kv @ wk, hk or h)
    v = split(x_kv @ wv, hk or h)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    if probs_drop is not None:
        probs = probs_drop(probs)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return ctx.transpose(0, 2, 1, 3).reshape(B, Lq, -1) @ wo


def _mlp_tail(x, ln_m, wi, wi0, wi1, wo_m, cfg, dtype, drop,
              inner_drop=None):
    """``inner_drop`` mirrors T5MLP's pre-wo activation dropout
    (layers.py:256-258)."""
    xn = _rms(x, ln_m, cfg.layer_norm_epsilon, dtype)
    if wi is not None:
        act = getattr(jax.nn, cfg.feed_forward_proj)(xn @ wi)
    else:
        gact = cfg.feed_forward_proj.removeprefix("gated-")
        act = getattr(jax.nn, gact)(xn @ wi0) * (xn @ wi1)
    if inner_drop is not None:
        act = inner_drop(act)
    return x + drop(act @ wo_m)


def _dropout(x, rate, rng):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _relpos_bias(relpos_weight, qlen, klen, bidirectional, cfg) -> Array:
    context = jnp.arange(qlen)[:, None]
    memory = jnp.arange(klen)[None, :]
    buckets = relative_position_bucket(
        memory - context, bidirectional=bidirectional,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance)
    values = jnp.take(jnp.asarray(relpos_weight, jnp.float32), buckets,
                      axis=0)                       # (q, k, h)
    return jnp.transpose(values, (2, 0, 1))[None]   # (1, h, q, k)


def make_scan_loss_fn(cfg: T5Config, dtype=jnp.float32, remat: bool = True):
    """Build ``loss_fn(params, input_ids, mask, labels, dropout_rng=None)``
    → (loss, logits), numerically equal to ``FiDT5.apply`` when
    dropout_rng is None."""

    def encoder_fwd(params, stacked_enc, flat_ids, flat_mask, rng):
        emb = jnp.asarray(params["t5"]["shared"]["embedding"], dtype=dtype)
        x = jnp.take(emb, flat_ids, axis=0)
        L = flat_ids.shape[1]
        bias = _relpos_bias(
            params["t5"]["encoder"]["relpos"]["rel_embedding"], L, L,
            True, cfg) + mask_to_bias(flat_mask)
        rate = cfg.dropout_rate
        if rng is not None and rate > 0.0:
            x = _dropout(x, rate, jax.random.fold_in(rng, 0))

        def body(carry, layer):
            x = carry
            blk, idx = layer
            if rng is not None and rate > 0.0:
                # the flax block has FOUR dropout sites per encoder layer:
                # attention probs, attn output, mlp inner (pre-wo), mlp
                # output — one per-layer stream split in four mirrors that
                r = jax.random.fold_in(rng, 1000 + idx)
                r1, r2, r3, r4 = jax.random.split(r, 4)
                h_in = x
                xn = _rms(h_in, blk[0], cfg.layer_norm_epsilon, dtype)
                att = _attend(xn, xn, blk[1], blk[2], blk[3], blk[4],
                              bias, cfg, dtype,
                              probs_drop=lambda t: _dropout(t, rate, r1))
                x = h_in + _dropout(att, rate, r2)
                x = _mlp_tail(x, blk[5], blk[6], blk[7], blk[8], blk[9],
                              cfg, dtype, lambda t: _dropout(t, rate, r4),
                              inner_drop=lambda t: _dropout(t, rate, r3))
            else:
                x = _apply_block(cfg, dtype, x, bias, blk)
            return x, None

        step = jax.checkpoint(body) if remat else body
        n = cfg.num_layers
        layers = (tuple(None if z is None else z
                        for z in stacked_enc), jnp.arange(n))
        x, _ = jax.lax.scan(step, x, layers)
        x = _rms(x, jnp.asarray(
            params["t5"]["encoder"]["final_ln"]["weight"], jnp.float32),
            cfg.layer_norm_epsilon, dtype)
        if rng is not None and rate > 0.0:
            x = _dropout(x, rate, jax.random.fold_in(rng, 1))
        return x

    def decoder_fwd(params, stacked_dec, dec_in, enc, enc_mask, rng):
        emb = jnp.asarray(params["t5"]["shared"]["embedding"], dtype=dtype)
        x = jnp.take(emb, dec_in, axis=0)
        T = dec_in.shape[1]
        self_bias = _relpos_bias(
            params["t5"]["decoder"]["relpos"]["rel_embedding"], T, T,
            False, cfg) + causal_bias(T, T)
        cross_bias = mask_to_bias(enc_mask)
        rate = cfg.dropout_rate
        if rng is not None and rate > 0.0:
            x = _dropout(x, rate, jax.random.fold_in(rng, 2))

        def body(carry, layer):
            x = carry
            blk, idx = layer
            # SIX dropout sites per decoder layer, matching the flax block:
            # self probs, self out, cross probs, cross out, mlp inner, mlp out
            if rng is not None and rate > 0.0:
                drop = lambda t, i: _dropout(t, rate, jax.random.fold_in(
                    jax.random.fold_in(rng, 2000 + idx), i))
                pdrop = lambda i: (lambda t: drop(t, i))
            else:
                drop = lambda t, i: t
                pdrop = lambda i: None
            xn = _rms(x, blk.ln_self, cfg.layer_norm_epsilon, dtype)
            x = x + drop(_attend(xn, xn, blk.sq, blk.sk, blk.sv, blk.so,
                                 self_bias, cfg, dtype,
                                 probs_drop=pdrop(0)), 1)
            xn = _rms(x, blk.ln_cross, cfg.layer_norm_epsilon, dtype)
            x = x + drop(_attend(xn, enc, blk.cq, blk.ck, blk.cv, blk.co,
                                 cross_bias, cfg, dtype,
                                 probs_drop=pdrop(2)), 3)
            x = _mlp_tail(x, blk.ln_mlp, blk.wi, blk.wi_0, blk.wi_1,
                          blk.wo_mlp, cfg, dtype, lambda t: drop(t, 5),
                          inner_drop=pdrop(4))
            return x, None

        step = jax.checkpoint(body) if remat else body
        n = cfg.num_decoder_layers
        x, _ = jax.lax.scan(step, x, (stacked_dec, jnp.arange(n)))
        x = _rms(x, jnp.asarray(
            params["t5"]["decoder"]["final_ln"]["weight"], jnp.float32),
            cfg.layer_norm_epsilon, dtype)
        if rng is not None and rate > 0.0:
            x = _dropout(x, rate, jax.random.fold_in(rng, 3))
        if cfg.tie_word_embeddings:
            x = x * (cfg.d_model ** -0.5)
            return x @ emb.T
        return x @ jnp.asarray(params["t5"]["lm_head"]["kernel"], dtype=dtype)

    def loss_fn(params, input_ids, mask, labels, dropout_rng=None):
        B, N, L = input_ids.shape
        stacked_enc = jax.tree_util.tree_map(
            lambda a: a[0],
            stack_encoder_blocks(params, cfg, n_stages=1, dtype=dtype))
        stacked_dec = stack_decoder_blocks(params, cfg, dtype=dtype)

        enc = encoder_fwd(params, stacked_enc, input_ids.reshape(B * N, L),
                          mask.reshape(B * N, L), dropout_rng)
        enc = enc.reshape(B, N * L, -1)
        enc_mask = mask.reshape(B, N * L)
        dec_in = shift_right(labels, cfg.decoder_start_token_id,
                             cfg.pad_token_id)
        logits = decoder_fwd(params, stacked_dec, dec_in, enc, enc_mask,
                             dropout_rng)
        valid = labels != -100
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = -(tll * valid).sum() / jnp.maximum(valid.sum(), 1)
        return loss, logits

    return loss_fn
