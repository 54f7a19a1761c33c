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

def test_blockwise_top_m_matches_topk_oracle():
    """blockwise_top_m == top_k over (B, K*V) of scores + log_softmax,
    values AND indices (index tie-breaks included), across block sizes
    and adversarial ties."""
    from lako_tpu.models.t5.beam_engine import blockwise_top_m

    rng = np.random.default_rng(0)
    B, K, V, m = 5, 4, 96, 8
    logits = jnp.asarray(rng.normal(size=(B, K, V)), jnp.float32)
    # plant exact ties straddling block boundaries and duplicated values
    logits = logits.at[0, 0, 10].set(7.0).at[0, 1, 50].set(7.0)
    logits = logits.at[1, 2, 31].set(5.0).at[1, 2, 32].set(5.0)
    logits = logits.at[2, 0, :].set(1.0)  # a whole constant row
    scores = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    scores = scores.at[0, 1].set(scores[0, 0])  # beam-score tie too

    logp = jax.nn.log_softmax(logits, axis=-1)
    cand = (scores[:, :, None] + logp).reshape(B, K * V)
    ref_s, ref_i = jax.lax.top_k(cand, m)

    for block in (16, 32, 48):
        ts, ti = blockwise_top_m(logits, scores, m, block=block)
        np.testing.assert_array_equal(np.asarray(ti), np.asarray(ref_i))
        np.testing.assert_allclose(np.asarray(ts), np.asarray(ref_s),
                                   rtol=0, atol=1e-6)


def test_blockwise_select_matches():
    """Full engine with select_impl=blockwise produces the same tokens as
    the plain top_k path (and therefore the HF-pinned flax beam)."""
    model, params, ids, mask = _make(seed=9)
    ref = BeamEngine(model, max_length=9, num_beams=3,
                     select_impl="topk").generate(params, ids, mask)
    out = BeamEngine(model, max_length=9, num_beams=3,
                     select_impl="blockwise",
                     select_block=16).generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    flax_ref = beam_generate(model, params, ids, mask, max_length=9,
                             num_beams=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(flax_ref))


def test_bad_select_impl_rejected():
    model, params, ids, mask = _make(seed=10)
    with pytest.raises(ValueError):
        BeamEngine(model, num_beams=2, select_impl="fancy")
    # explicit blockwise is validated at CONSTRUCTION (a clear message, not
    # an XLA top_k shape error deep inside jit at first generate)
    with pytest.raises(ValueError, match="does not divide"):
        # block does not divide the vocab
        BeamEngine(model, num_beams=2, select_impl="blockwise",
                   select_block=7)
    with pytest.raises(ValueError, match=">= 2 blocks"):
        # block == vocab factors but leaves a single degenerate block
        BeamEngine(model, num_beams=2, select_impl="blockwise",
                   select_block=64)


@pytest.mark.parametrize("num_beams", [2, 3, 4])
@pytest.mark.parametrize("impl", ["packed", "stepmajor", "fusedkv"])
def test_alt_cache_impl_matches_allslots(impl, num_beams):
    """Alternative cache layouts (packed: flat m = s*K + k interleave;
    stepmajor: (l,S,B,K,h*d) slab-per-step) produce identical tokens to
    the slot-structured cache."""
    model, params, ids, mask = _make(seed=11)
    a = BeamEngine(model, max_length=9, num_beams=num_beams,
                   self_attn_impl="allslots").generate(params, ids, mask)
    p = BeamEngine(model, max_length=9, num_beams=num_beams,
                   self_attn_impl=impl).generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(a))


def test_packed_impl_matches_flax_beam():
    model, params, ids, mask = _make(seed=12)
    ref = beam_generate(model, params, ids, mask, max_length=10, num_beams=4)
    eng = BeamEngine(model, max_length=10, num_beams=4,
                     self_attn_impl="packed")
    # K=4 divides 128 -> steps padded to a lane multiple (M = 128)
    assert eng.steps_pad * 4 % 128 == 0
    out = eng.generate(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
