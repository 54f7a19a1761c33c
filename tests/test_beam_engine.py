"""Ancestry-gather beam engine parity vs the flax beam path (which is itself
pinned against HF torch generate in tests/test_beam.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.beam import beam_generate
from lako_tpu.models.t5.beam_engine import BeamEngine
from lako_tpu.models.t5.engine import engine_supported
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


@pytest.mark.parametrize("num_beams", [2, 4])
def test_beam_engine_matches_flax_beam(num_beams):
    model, params, ids, mask = _make()
    ref = beam_generate(model, params, ids, mask, max_length=10,
                        num_beams=num_beams)
    eng = BeamEngine(model, max_length=10, num_beams=num_beams)
    out = eng.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_beam_engine_length_penalty():
    model, params, ids, mask = _make(seed=2)
    ref = beam_generate(model, params, ids, mask, max_length=8, num_beams=3,
                        length_penalty=0.6)
    eng = BeamEngine(model, max_length=8, num_beams=3, length_penalty=0.6)
    out = eng.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_beam_engine_multiquery_cross():
    model, params, ids, mask = _make({"multiquery_cross_attention": True},
                                     seed=3)
    ref = beam_generate(model, params, ids, mask, max_length=8, num_beams=2)
    eng = BeamEngine(model, max_length=8, num_beams=2)
    out = eng.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_beam_engine_gated_act_untied():
    model, params, ids, mask = _make(
        {"feed_forward_proj": "gated-gelu", "tie_word_embeddings": False},
        seed=4)
    ref = beam_generate(model, params, ids, mask, max_length=8, num_beams=2)
    eng = BeamEngine(model, max_length=8, num_beams=2)
    out = eng.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_beam_engine_scan_unroll1_matches():
    model, params, ids, mask = _make(seed=5)
    ref = BeamEngine(model, max_length=8, num_beams=2).generate(
        params, ids, mask)
    out = BeamEngine(model, max_length=8, num_beams=2,
                     layer_unroll=1).generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_beam_engine_rejects_fido_stride():
    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                   num_layers=1, num_decoder_layers=4, num_heads=4,
                   relative_attention_num_buckets=8,
                   cross_attention_stride=2)
    assert not engine_supported(cfg)
    model = FiDT5(cfg, dtype=jnp.float32)
    with pytest.raises(ValueError):
        BeamEngine(model)


def test_best_generate_fn_routes_beam_to_engine():
    """num_beams>1 through the dispatcher lands on the engine and matches the
    flax beam output."""
    from lako_tpu.models.t5.decode import make_best_generate_fn

    model, params, ids, mask = _make(seed=6)
    fn = make_best_generate_fn(model, max_length=8, num_beams=2)
    tokens, xl = fn(params, ids, mask)
    assert xl is None
    ref = beam_generate(model, params, ids, mask, max_length=8, num_beams=2)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref))
    # flax fallback path agrees too
    fb = make_best_generate_fn(model, max_length=8, num_beams=2,
                               backend="flax")
    t2, _ = fb(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(ref))


@pytest.mark.parametrize("impl", ["gather", "flat"])
def test_alt_impls_match_allslots(impl):
    model, params, ids, mask = _make(seed=6)
    a = BeamEngine(model, max_length=9, num_beams=3,
                   self_attn_impl="allslots").generate(params, ids, mask)
    g = BeamEngine(model, max_length=9, num_beams=3,
                   self_attn_impl=impl).generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(g))


def test_gather_impl_matches_flax_beam():
    model, params, ids, mask = _make(seed=7)
    ref = beam_generate(model, params, ids, mask, max_length=8, num_beams=2)
    out = BeamEngine(model, max_length=8, num_beams=2,
                     self_attn_impl="gather").generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_bad_self_attn_impl_rejected():
    model, params, ids, mask = _make(seed=8)
    with pytest.raises(ValueError):
        BeamEngine(model, num_beams=2, self_attn_impl="scatter")
