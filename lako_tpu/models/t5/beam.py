"""Fixed-shape beam search for the FiD reader.

HF-generate-compatible semantics (num_beams=k, length_penalty 1.0,
early_stopping=False — the defaults the reference would hit via
``model.generate``): at each step 2k candidates are drawn; EOS candidates are
banked into a finished pool, the best k non-EOS candidates continue; at the end
live beams are banked too and the best pooled hypothesis wins. Everything is a
lax.scan over static shapes with KV caches gathered along the beam axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lako_tpu.models.t5.model import FiDT5

Array = jax.Array

NEG_INF = -1.0e7


def _flatten_beams(x):
    return x.reshape((-1,) + x.shape[2:])


def beam_generate(
    model: FiDT5,
    params,
    input_ids: Array,   # (B, N, L)
    mask: Array,        # (B, N, L)
    max_length: int = 50,
    num_beams: int = 4,
    length_penalty: float = 1.0,
) -> Array:
    """Returns best sequences (B, max_length-1), padded after EOS."""
    from lako_tpu.models.t5.decode import (
        _decode_biases,
        _decode_step,
        _embed_tokens,
        _encode,
        _init_cache,
        _logits,
    )

    cfg = model.config
    B = input_ids.shape[0]
    K = num_beams
    steps = max_length - 1
    variables = {"params": params}

    enc, enc_mask = model.apply(variables, input_ids, mask, method=_encode)
    # tile encoder state across beams: (B*K, ...)
    enc = jnp.repeat(enc, K, axis=0)
    enc_mask = jnp.repeat(enc_mask, K, axis=0)
    self_caches, cross_kvs = model.apply(variables, B * K, steps, enc,
                                         method=_init_cache)
    self_bias_full, cross_bias = model.apply(variables, enc_mask, steps,
                                             method=_decode_biases)

    def step_logits(tokens_flat, caches, step):
        embeds = model.apply(variables, tokens_flat[:, None], method=_embed_tokens)
        hidden, _, new_caches = model.apply(
            variables, embeds, self_bias_full, cross_bias, caches, cross_kvs,
            step, steps, False,
            method=_decode_step,
        )
        logits = model.apply(variables, hidden[:, 0], method=_logits)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), new_caches

    V = cfg.vocab_size

    # state: tokens (B,K,steps), beam_scores (B,K), caches, finished pool:
    # fin_tokens (B,K,steps), fin_scores (B,K)
    init_tokens = jnp.full((B, K, steps), cfg.pad_token_id, jnp.int32)
    # beam 0 active, others -inf so the first expansion comes from one beam
    init_scores = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.full((B, K - 1), NEG_INF)], axis=1
    ).astype(jnp.float32)
    fin_tokens = jnp.full((B, K, steps), cfg.pad_token_id, jnp.int32)
    fin_scores = jnp.full((B, K), NEG_INF, jnp.float32)

    start = jnp.full((B * K,), cfg.decoder_start_token_id, jnp.int32)

    def gather_caches(caches, beam_idx_flat):
        return [
            (k.take(beam_idx_flat, axis=0), v.take(beam_idx_flat, axis=0))
            for k, v in caches
        ]

    def body(carry, step):
        tokens, scores, caches, fin_t, fin_s, prev_tok = carry
        logp, new_caches = step_logits(prev_tok.reshape(B * K), caches, step)
        logp = logp.reshape(B, K, V)
        cand = scores[:, :, None] + logp                     # (B, K, V)
        cand_flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(cand_flat, 2 * K)  # (B, 2K)
        src_beam = top_idx // V
        tok = (top_idx % V).astype(jnp.int32)
        is_eos = tok == cfg.eos_token_id

        # --- bank EOS candidates into the finished pool ---
        # hypothesis tokens = source beam's prefix with EOS at `step`
        length = (step + 1).astype(jnp.float32)
        norm = top_scores / (length ** length_penalty)
        eos_scores = jnp.where(is_eos, norm, NEG_INF)         # (B, 2K)
        pool_scores = jnp.concatenate([fin_s, eos_scores], axis=1)  # (B, K+2K)
        src_prefix = jnp.take_along_axis(
            tokens[:, :, :], src_beam[:, :, None], axis=1
        )                                                      # (B, 2K, steps)
        onehot = jax.nn.one_hot(step, steps, dtype=jnp.int32)
        eos_seq = src_prefix * (1 - onehot) + cfg.eos_token_id * onehot
        pool_tokens = jnp.concatenate([fin_t, eos_seq], axis=1)
        new_fin_s, fin_idx = jax.lax.top_k(pool_scores, K)
        new_fin_t = jnp.take_along_axis(pool_tokens, fin_idx[:, :, None], axis=1)

        # --- continue with best K non-EOS candidates ---
        cont_scores = jnp.where(is_eos, NEG_INF, top_scores)
        live_scores, live_pos = jax.lax.top_k(cont_scores, K)  # (B, K)
        live_beam = jnp.take_along_axis(src_beam, live_pos, axis=1)
        live_tok = jnp.take_along_axis(tok, live_pos, axis=1)
        new_tokens = jnp.take_along_axis(tokens, live_beam[:, :, None], axis=1)
        new_tokens = new_tokens * (1 - onehot) + live_tok[:, :, None] * onehot

        beam_idx_flat = (live_beam + jnp.arange(B)[:, None] * K).reshape(B * K)
        new_caches = gather_caches(new_caches, beam_idx_flat)
        return (new_tokens, live_scores, new_caches, new_fin_t, new_fin_s,
                live_tok), None

    carry = (init_tokens, init_scores, self_caches, fin_tokens, fin_scores,
             start.reshape(B, K))
    (tokens, scores, _, fin_t, fin_s, _), _ = jax.lax.scan(
        body, carry, jnp.arange(steps, dtype=jnp.int32)
    )

    # bank the surviving live beams (length = steps)
    live_norm = scores / (float(steps) ** length_penalty)
    pool_scores = jnp.concatenate([fin_s, live_norm], axis=1)
    pool_tokens = jnp.concatenate([fin_t, tokens], axis=1)
    best = jnp.argmax(pool_scores, axis=1)
    out = jnp.take_along_axis(pool_tokens, best[:, None, None], axis=1)[:, 0]

    # pad everything after the first EOS
    eos_mask = out == cfg.eos_token_id
    after = jnp.cumsum(jnp.cumsum(eos_mask, axis=1), axis=1) > 1
    out = jnp.where(after, cfg.pad_token_id, out)
    return out


def make_beam_generate_fn(model: FiDT5, max_length: int = 50, num_beams: int = 4,
                          length_penalty: float = 1.0):
    @jax.jit
    def fn(params, input_ids, mask):
        return beam_generate(model, params, input_ids, mask,
                             max_length=max_length, num_beams=num_beams,
                             length_penalty=length_penalty)

    return fn
