"""Jitted autoregressive decoding for the FiD reader.

Replaces HF ``generate`` (reference: src/model.py:54-60, test_reader.py:65-69) with
a fixed-shape lax.scan loop: self-attention KV caches are preallocated at
``max_length``, encoder cross K/V are projected once, and every step is a
static-shape MXU matmul — no recompiles, no host round-trips.

Cross-attention distillation signal: like the reference (which stores only the
*first* decode step's scores — ``if self.score_storage is None``,
src/model.py:327-329), step 0 runs outside the scan with
``collect_cross_logits=True`` and returns (B, layers, heads, N·L) pre-softmax
logits.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from lako_tpu.core.program_cache import cached_program, dtype_key
from lako_tpu.models.t5.model import FiDT5

Array = jax.Array


def _model_key(model: FiDT5) -> tuple:
    """Static identity of a FiDT5 module for program caching: two instances
    with equal fields trace to the same program."""
    return (model.config, dtype_key(model.dtype), model.use_remat,
            model.remat_policy)


def _embed_tokens(mdl: FiDT5, tokens: Array) -> Array:
    return mdl.t5.shared(tokens)


def _logits(mdl: FiDT5, hidden: Array) -> Array:
    return mdl.t5.logits_from_hidden(hidden)


def _encode(mdl: FiDT5, ids, mask):
    return mdl.encode_passages(ids, mask)


def _init_cache(mdl: FiDT5, batch, max_len, enc):
    return mdl.t5.decoder.init_cache(batch, max_len, enc)


def _decode_step(mdl: FiDT5, embeds, self_bias_full, cross_bias, self_caches,
                 cross_kvs, step, max_len, collect):
    return mdl.t5.decoder.decode_step(
        embeds, self_bias_full, cross_bias, self_caches, cross_kvs, step,
        max_len, collect_cross_logits=collect,
    )


def _decode_biases(mdl: FiDT5, enc_mask, max_len):
    return mdl.t5.decoder.decode_biases(enc_mask, max_len)


def eliminate_tokens(enc: Array, enc_mask: Array, keep_tokens: int
                     ) -> Tuple[Array, Array]:
    """Token elimination (PAPERS.md: arXiv 2310.13682): keep only the
    ``keep_tokens`` highest-salience encoder states per example before the
    decoder cross-attends, shrinking the cross-KV working set (the decode
    bandwidth driver) by K/(N·L). Salience = L2 norm of the encoder state —
    cheap, decoder-agnostic, and a strong proxy for cross-attention mass.
    Static shapes: top-k gather, so one executable regardless of content."""
    import jax.numpy as jnp

    salience = jnp.linalg.norm(enc.astype(jnp.float32), axis=-1)
    salience = jnp.where(enc_mask, salience, -jnp.inf)
    _, idx = jax.lax.top_k(salience, keep_tokens)         # (B, K)
    kept = jnp.take_along_axis(enc, idx[:, :, None], axis=1)
    kept_mask = jnp.take_along_axis(enc_mask, idx, axis=1)
    return kept, kept_mask


def greedy_generate(
    model: FiDT5,
    params,
    input_ids: Array,   # (B, N, L)
    mask: Array,        # (B, N, L) bool
    max_length: int = 50,
    collect_cross_scores: bool = False,
    early_exit: bool = False,
    keep_tokens: Optional[int] = None,
) -> Tuple[Array, Optional[Array]]:
    """Greedy decode. Returns (tokens (B, max_length-1), first-step cross-attention
    logits (B, layers, heads, N·L) or None).

    ``max_length`` counts the decoder-start token like HF generate, so up to
    ``max_length - 1`` tokens are produced. ``keep_tokens`` enables token
    elimination (incompatible with score capture: positions lose their
    collate-time span mapping)."""
    cfg = model.config
    B = input_ids.shape[0]
    steps = max_length - 1
    variables = {"params": params}

    enc, enc_mask = model.apply(variables, input_ids, mask, method=_encode)
    if keep_tokens is not None and keep_tokens < enc.shape[1]:
        if collect_cross_scores:
            raise ValueError("token elimination breaks fact-span mapping; "
                             "disable collect_cross_scores")
        enc, enc_mask = eliminate_tokens(enc, enc_mask, keep_tokens)
    self_caches, cross_kvs = model.apply(variables, B, steps, enc, method=_init_cache)
    self_bias_full, cross_bias = model.apply(variables, enc_mask, steps,
                                             method=_decode_biases)

    def one_step(tokens, caches, step, collect):
        embeds = model.apply(variables, tokens[:, None], method=_embed_tokens)
        hidden, xl, new_caches = model.apply(
            variables, embeds, self_bias_full, cross_bias, caches, cross_kvs,
            step, steps, collect,
            method=_decode_step,
        )
        logits = model.apply(variables, hidden[:, 0], method=_logits)
        return logits, xl, new_caches

    start = jnp.full((B,), cfg.decoder_start_token_id, dtype=jnp.int32)

    # Step 0 outside the scan: capture cross-attention logits if requested.
    logits0, xl0, caches = one_step(start, self_caches, jnp.int32(0), collect_cross_scores)
    tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    done0 = tok0 == cfg.eos_token_id

    if steps > 1:
        if early_exit:
            # lax.while_loop exiting once every row emitted EOS (answers are
            # 1-5 tokens vs max_length 50). NOTE: on the axon-tunneled backend
            # dynamic-trip-count loops appear to be host-interpreted
            # (measured 2.3 s/step vs 70 ms/step under scan), so this is
            # opt-in; on real TPU runtimes it cuts eval decode ~10x.
            tokens0 = jnp.full((B, steps), cfg.pad_token_id, jnp.int32)
            tokens0 = tokens0.at[:, 0].set(tok0)

            def cond(state):
                step, tokens, prev_tok, done, caches_ = state
                return (step < steps) & ~jnp.all(done)

            def body(state):
                step, tokens, prev_tok, done, caches_ = state
                logits, _, new_caches = one_step(prev_tok, caches_, step, False)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                tok = jnp.where(done, cfg.pad_token_id, tok)
                new_done = done | (tok == cfg.eos_token_id)
                tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None],
                                                      (0, step))
                return step + 1, tokens, tok, new_done, new_caches

            _, tokens, _, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(1), tokens0, tok0, done0, caches)
            )
        else:
            def scan_body(carry, step):
                prev_tok, done, caches_ = carry
                logits, _, new_caches = one_step(prev_tok, caches_, step, False)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                tok = jnp.where(done, cfg.pad_token_id, tok)
                new_done = done | (tok == cfg.eos_token_id)
                return (tok, new_done, new_caches), tok

            (_, _, _), rest = jax.lax.scan(
                scan_body, (tok0, done0, caches),
                jnp.arange(1, steps, dtype=jnp.int32),
            )
            tokens = jnp.concatenate([tok0[:, None], rest.swapaxes(0, 1)], axis=1)
    else:
        tokens = tok0[:, None]
    return tokens, xl0


def make_generate_fn(
    model: FiDT5, max_length: int = 50, collect_cross_scores: bool = False,
    early_exit: bool = False, keep_tokens=None,
) -> Callable:
    """Jit-compiled (params, input_ids, mask) → (tokens, cross_logits|None).

    Process-cached by (model identity, knobs): repeated stage invocations with
    equal configs reuse the same jitted callable, so XLA's compile cache hits
    instead of retracing (core/program_cache.py)."""

    def build():
        @jax.jit
        def fn(params, input_ids, mask):
            return greedy_generate(
                model, params, input_ids, mask,
                max_length=max_length,
                collect_cross_scores=collect_cross_scores,
                early_exit=early_exit, keep_tokens=keep_tokens,
            )

        return fn

    return cached_program(
        ("flax_generate", _model_key(model), max_length, collect_cross_scores,
         early_exit, keep_tokens), build)


def make_best_generate_fn(
    model: FiDT5, max_length: int = 50, collect_cross_scores: bool = False,
    keep_tokens=None, backend: str = "auto", kv_dtype: str = "native",
    weights_dtype: str = "native", chunk_size=None, early_exit: bool = False,
    num_beams: int = 1, length_penalty: float = 1.0,
    self_attn_impl: str = "allslots",
) -> Callable:
    """Backend dispatcher: the stacked scan-over-layers engine
    (models/t5/engine.py greedy, beam_engine.py beam — the fast paths) when
    the model supports it, the layer-unrolled flax path otherwise.

    backend: "auto" | "engine" | "flax". Token elimination (keep_tokens) and
    early_exit-while-loop are flax-path-only features; the engine covers the
    early-exit use case with chunk_size instead. ``num_beams > 1`` selects
    beam search (reference surface: src/model.py:54-60 via HF generate);
    cross-attention score capture requires greedy, matching the reference's
    scoring pipeline. ``self_attn_impl`` selects the beam engine's self-KV
    formulation (allslots | gather | flat; beam_engine.py's measured A/B —
    greedy paths ignore it).

    Returned callables are process-cached by (model identity, knobs) so
    repeated stage invocations reuse compiled programs (program_cache.py).
    """
    key = ("best_generate", _model_key(model), max_length,
           collect_cross_scores, keep_tokens, backend, kv_dtype,
           weights_dtype, chunk_size, early_exit, num_beams, length_penalty,
           self_attn_impl)
    return cached_program(key, lambda: _build_best_generate_fn(
        model, max_length, collect_cross_scores, keep_tokens, backend,
        kv_dtype, weights_dtype, chunk_size, early_exit, num_beams,
        length_penalty, self_attn_impl))


def _build_best_generate_fn(
    model: FiDT5, max_length: int, collect_cross_scores: bool,
    keep_tokens, backend: str, kv_dtype: str, weights_dtype: str,
    chunk_size, early_exit: bool, num_beams: int, length_penalty: float,
    self_attn_impl: str,
) -> Callable:
    from lako_tpu.models.t5.engine import engine_supported, make_engine_generate_fn

    if num_beams > 1:
        if collect_cross_scores:
            raise ValueError(
                "cross-attention score capture requires greedy decode")
        # features NO beam path implements must fail loudly, not silently
        # change semantics (keep_tokens) or memory behavior (int8 dtypes)
        if keep_tokens is not None:
            raise ValueError(
                "keep_tokens (token elimination) is not supported with "
                "beam search; use greedy decode or drop keep_tokens")
        if kv_dtype != "native" or weights_dtype != "native":
            raise ValueError(
                "int8 decode dtypes are not supported with beam search "
                "(native only)")
        if early_exit or chunk_size is not None:
            from lako_tpu.core.logging import get_logger

            get_logger().warning(
                "beam search ignores early_exit/chunk_size (greedy-only "
                "knobs); decoding the full %d steps", max_length - 1)
        beam_ok = engine_supported(model.config)
        if backend == "engine" and not beam_ok:
            raise ValueError(
                "decode_backend='engine' but the beam engine does not "
                "support this configuration (FiDO cross_attention_stride)")
        if backend != "flax" and beam_ok:
            from lako_tpu.models.t5.beam_engine import \
                make_beam_engine_generate_fn

            beam_fn = make_beam_engine_generate_fn(
                model, max_length=max_length, num_beams=num_beams,
                length_penalty=length_penalty,
                self_attn_impl=self_attn_impl)
        else:
            if self_attn_impl != "allslots":
                raise ValueError(
                    f"self_attn_impl={self_attn_impl!r} is a beam-engine "
                    "knob; the flax beam path has no equivalent — drop it "
                    "or use backend='engine'")
            from lako_tpu.models.t5.beam import make_beam_generate_fn

            beam_fn = make_beam_generate_fn(
                model, max_length=max_length, num_beams=num_beams,
                length_penalty=length_penalty)
        return lambda params, ids, mask: (beam_fn(params, ids, mask), None)

    if self_attn_impl != "allslots":
        from lako_tpu.core.logging import get_logger

        get_logger().warning(
            "self_attn_impl=%r only affects beam search (num_beams>1); "
            "greedy decode ignores it", self_attn_impl)
    engine_ok = (engine_supported(model.config) and keep_tokens is None
                 and not early_exit)
    if backend == "engine" and not engine_ok:
        raise ValueError(
            "decode_backend='engine' but the engine does not support this "
            "configuration (FiDO stride / keep_tokens / early_exit)")
    if backend != "flax" and engine_ok:
        return make_engine_generate_fn(
            model, max_length=max_length,
            collect_cross_scores=collect_cross_scores,
            kv_dtype=kv_dtype, weights_dtype=weights_dtype,
            chunk_size=chunk_size)
    return make_generate_fn(model, max_length=max_length,
                            collect_cross_scores=collect_cross_scores,
                            early_exit=early_exit, keep_tokens=keep_tokens)


def make_generate_and_score_fn(model: FiDT5, signal_cfg, max_length: int = 50,
                               backend: str = "auto", kv_dtype: str = "native",
                               weights_dtype: str = "native",
                               chunk_size=None) -> Callable:
    """Generate + ON-DEVICE fact-score aggregation:
    (params, ids, mask, fact_spans) → (tokens, fact_scores (B, n_context)).

    Only the tokens and n_context floats per example cross the host boundary —
    the (B, layers, heads, N·L) logits never leave the chip. This is the fast
    path for the attention-generate stage. Dispatches to the scan-over-layers
    engine like :func:`make_best_generate_fn`; process-cached the same way."""
    key = ("generate_and_score", _model_key(model), signal_cfg, max_length,
           backend, kv_dtype, weights_dtype, chunk_size)
    return cached_program(key, lambda: _build_generate_and_score_fn(
        model, signal_cfg, max_length, backend, kv_dtype, weights_dtype,
        chunk_size))


def _build_generate_and_score_fn(model: FiDT5, signal_cfg, max_length: int,
                                 backend: str, kv_dtype: str,
                                 weights_dtype: str, chunk_size) -> Callable:
    from lako_tpu.models.t5.engine import engine_supported
    from lako_tpu.signal.aggregate import aggregate_fact_scores_device

    if backend == "engine" and not engine_supported(model.config):
        raise ValueError(
            "decode_backend='engine' but the engine does not support this "
            "configuration (FiDO cross_attention_stride)")
    if backend != "flax" and engine_supported(model.config):
        gen = make_best_generate_fn(
            model, max_length=max_length, collect_cross_scores=True,
            backend=backend, kv_dtype=kv_dtype, weights_dtype=weights_dtype,
            chunk_size=chunk_size)
        score = jax.jit(lambda xl, mask, spans: aggregate_fact_scores_device(
            xl, mask, spans, signal_cfg))

        def fn(params, input_ids, mask, fact_spans):
            tokens, xl = gen(params, input_ids, mask)
            return tokens, score(xl, mask, fact_spans)

        return fn

    @jax.jit
    def fn(params, input_ids, mask, fact_spans):
        tokens, xl = greedy_generate(
            model, params, input_ids, mask,
            max_length=max_length, collect_cross_scores=True,
        )
        scores = aggregate_fact_scores_device(xl, mask, fact_spans, signal_cfg)
        return tokens, scores

    return fn
