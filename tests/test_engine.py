"""Stacked-parameter decode engine parity vs the flax decode path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.decode import greedy_generate
from lako_tpu.models.t5.engine import DecodeEngine, engine_supported
from lako_tpu.models.t5.model import FiDT5


def _make(cfg_kwargs=None, seed=0, B=3, N=2, L=10):
    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                   num_layers=2, num_decoder_layers=3, num_heads=4,
                   relative_attention_num_buckets=8, dropout_rate=0.0,
                   **(cfg_kwargs or {}))
    model = FiDT5(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(1, 64, size=(B, N, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, N, L)) < 0.9)
    labels = jnp.zeros((B, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), ids, mask, labels)["params"]
    return model, params, ids, mask


@pytest.mark.parametrize("collect", [False, True])
def test_engine_matches_flax_decode(collect):
    model, params, ids, mask = _make()
    ref_tokens, ref_xl = greedy_generate(model, params, ids, mask,
                                         max_length=8,
                                         collect_cross_scores=collect)
    eng = DecodeEngine(model, max_length=8, collect_cross_scores=collect)
    tokens, xl = eng.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))
    if collect:
        assert xl.shape == ref_xl.shape  # (B, layers, heads, N*L)
        np.testing.assert_allclose(np.asarray(xl), np.asarray(ref_xl),
                                   rtol=1e-4, atol=1e-4)
    else:
        assert xl is None


def test_engine_multiquery_cross():
    model, params, ids, mask = _make({"multiquery_cross_attention": True},
                                     seed=3)
    ref_tokens, _ = greedy_generate(model, params, ids, mask, max_length=8)
    eng = DecodeEngine(model, max_length=8)
    tokens, _ = eng.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))


def test_engine_gated_act():
    model, params, ids, mask = _make({"feed_forward_proj": "gated-gelu"},
                                     seed=4)
    ref_tokens, _ = greedy_generate(model, params, ids, mask, max_length=6)
    eng = DecodeEngine(model, max_length=6)
    tokens, _ = eng.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))


def test_engine_chunked_early_exit_matches():
    model, params, ids, mask = _make(seed=5)
    eng = DecodeEngine(model, max_length=10)
    ref_tokens, _ = eng.generate(params, ids, mask)
    chunked = DecodeEngine(model, max_length=10, chunk_size=3)
    tokens, _ = chunked.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))


def test_engine_int8_kv_close():
    model, params, ids, mask = _make(seed=6)
    eng = DecodeEngine(model, max_length=8, collect_cross_scores=True)
    ref_tokens, ref_xl = eng.generate(params, ids, mask)
    q8 = DecodeEngine(model, max_length=8, collect_cross_scores=True,
                      kv_dtype="int8")
    tokens, xl = q8.generate(params, ids, mask)
    # int8 KV: first-step cross logits within quantization tolerance and the
    # overwhelming majority of greedy tokens unchanged
    mask_flat = np.asarray(mask).reshape(mask.shape[0], -1)
    valid = mask_flat[:, None, None, :]
    err = np.abs(np.asarray(xl) - np.asarray(ref_xl)) * valid
    scale = np.abs(np.asarray(ref_xl) * valid).max()
    assert err.max() <= 0.05 * scale
    agree = (np.asarray(tokens) == np.asarray(ref_tokens)).mean()
    assert agree >= 0.9, agree


def test_quantize_weight_error_bound():
    """Per-output-channel int8: reconstruction error ≤ scale/2 per element,
    and x@w matches the quantized matmul within the propagated bound."""
    from lako_tpu.models.t5.engine import _mm, _quantize_weight

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(16, 24)) * 3.0, jnp.float32)
    qw = _quantize_weight(w)
    recon = qw.values.astype(jnp.float32) * qw.scale
    assert np.abs(np.asarray(recon - w)).max() <= np.asarray(qw.scale).max() / 2 + 1e-6
    x = jnp.asarray(rng.normal(size=(5, 16)), jnp.float32)
    y = _mm(x, qw, jnp.float32)
    bound = (np.abs(np.asarray(x)).sum(1).max()
             * np.asarray(qw.scale).max() / 2)
    assert np.abs(np.asarray(y - x @ w)).max() <= bound + 1e-5


def test_engine_int8_weights_close():
    """Weight-only int8: greedy tokens overwhelmingly match and first-step
    cross logits stay within quantization tolerance of the native engine."""
    model, params, ids, mask = _make(seed=7)
    eng = DecodeEngine(model, max_length=8, collect_cross_scores=True)
    ref_tokens, ref_xl = eng.generate(params, ids, mask)
    q8 = DecodeEngine(model, max_length=8, collect_cross_scores=True,
                      weights_dtype="int8")
    tokens, xl = q8.generate(params, ids, mask)
    mask_flat = np.asarray(mask).reshape(mask.shape[0], -1)
    valid = mask_flat[:, None, None, :]
    err = np.abs(np.asarray(xl) - np.asarray(ref_xl)) * valid
    scale = np.abs(np.asarray(ref_xl) * valid).max()
    assert err.max() <= 0.1 * scale
    agree = (np.asarray(tokens) == np.asarray(ref_tokens)).mean()
    assert agree >= 0.85, agree


def test_engine_int8_weights_gated_runs():
    model, params, ids, mask = _make({"feed_forward_proj": "gated-gelu"},
                                     seed=8)
    q8 = DecodeEngine(model, max_length=6, weights_dtype="int8",
                      kv_dtype="int8")
    tokens, _ = q8.generate(params, ids, mask)
    assert tokens.shape == (3, 5)


def test_engine_untied_lm_head():
    """tie_word_embeddings=False (T5 v1.1 style): the engine must use the
    lm_head kernel, not the shared embedding (regression: it silently
    produced garbage tokens on untied checkpoints)."""
    model, params, ids, mask = _make({"tie_word_embeddings": False}, seed=11)
    ref_tokens, _ = greedy_generate(model, params, ids, mask, max_length=8)
    eng = DecodeEngine(model, max_length=8)
    tokens, _ = eng.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))
    # int8 weights quantize the lm_head too — must still run and agree mostly
    q8 = DecodeEngine(model, max_length=8, weights_dtype="int8")
    qtokens, _ = q8.generate(params, ids, mask)
    assert (np.asarray(qtokens) == np.asarray(ref_tokens)).mean() >= 0.85


def test_engine_rejects_fido_stride():
    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                   num_layers=1, num_decoder_layers=4, num_heads=4,
                   relative_attention_num_buckets=8,
                   cross_attention_stride=2)
    assert not engine_supported(cfg)
    model = FiDT5(cfg, dtype=jnp.float32)
    with pytest.raises(ValueError):
        DecodeEngine(model)


def test_chunking_guard_normalizes_and_warns(caplog):
    """VERDICT r2 #6: chunk_size >= steps is the unchunked program (no extra
    device calls — normalized away); a small chunk warns with the measured
    worst-case dispatch arithmetic."""
    import logging

    from lako_tpu.models.t5.engine import chunking_worst_case_overhead

    model, params, ids, mask = _make(seed=9)
    eng = DecodeEngine(model, max_length=10, chunk_size=64)
    assert eng.chunk_size is None     # one chunk == unchunked
    with caplog.at_level(logging.WARNING, logger="lako_tpu"):
        DecodeEngine(model, max_length=50, chunk_size=4)
    assert any("chunk_size" in r.message for r in caplog.records)
    # the arithmetic: 49 steps / chunk 4 -> 12 extra calls at 72 ms over
    # 49 x 16 ms of steps ~ 110% worst-case overhead
    assert chunking_worst_case_overhead(49, 4) > 1.0
    assert chunking_worst_case_overhead(49, 49) == 0.0
