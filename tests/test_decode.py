"""Decode-loop tests: greedy generation parity vs HF torch generate, and
incremental-vs-teacher-forcing consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lako_tpu.models.t5 import FiDT5
from lako_tpu.models.t5.convert import fid_params_from_torch_t5, t5_config_from_hf
from lako_tpu.models.t5.decode import greedy_generate, make_generate_fn


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(1)
    hf_cfg = transformers.T5Config(
        vocab_size=100, d_model=64, d_kv=16, d_ff=128,
        num_layers=2, num_decoder_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=32,
        dropout_rate=0.0, decoder_start_token_id=0,
    )
    model = transformers.T5ForConditionalGeneration(hf_cfg)
    model.eval()
    cfg = t5_config_from_hf(hf_cfg)
    params = fid_params_from_torch_t5(model.state_dict(), cfg)
    return model, cfg, params


def test_greedy_matches_hf_generate(setup):
    model, cfg, params = setup
    fid = FiDT5(cfg)
    rs = np.random.default_rng(5)
    B, L = 3, 10
    ids = rs.integers(2, 100, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), dtype=bool)
    max_length = 12

    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            max_length=max_length,
            do_sample=False,
            num_beams=1,
        ).numpy()

    tokens, _ = greedy_generate(
        fid, params, jnp.asarray(ids)[:, None, :], jnp.asarray(mask)[:, None, :],
        max_length=max_length,
    )
    tokens = np.asarray(tokens)

    # HF output: [decoder_start, tok1, ..., up to max_length], padded after EOS.
    for b in range(B):
        ref_toks = list(ref[b][1:])  # drop decoder_start
        our_toks = list(tokens[b])
        # truncate both at EOS
        def upto_eos(seq):
            out = []
            for t in seq:
                out.append(int(t))
                if t == cfg.eos_token_id:
                    break
            return out
        assert upto_eos(our_toks) == upto_eos(ref_toks), (b, our_toks, ref_toks)


def test_incremental_matches_teacher_forcing(setup):
    """Feeding the greedy tokens back through the teacher-forcing path must
    reproduce the same argmax at every position (KV-cache correctness)."""
    model, cfg, params = setup
    fid = FiDT5(cfg)
    rs = np.random.default_rng(9)
    B, N, L = 2, 3, 8
    ids = rs.integers(2, 100, size=(B, N, L)).astype(np.int32)
    mask = np.ones((B, N, L), dtype=bool)
    mask[0, 1, 5:] = False

    tokens, _ = greedy_generate(fid, params, jnp.asarray(ids), jnp.asarray(mask),
                                max_length=8)
    tokens = np.asarray(tokens)

    # teacher-forcing pass over the generated prefix
    labels = jnp.asarray(tokens.astype(np.int32))
    _, tf_logits, _ = fid.apply({"params": params}, jnp.asarray(ids),
                                jnp.asarray(mask), labels)
    tf_argmax = np.asarray(jnp.argmax(tf_logits, axis=-1))

    for b in range(B):
        for t in range(tokens.shape[1]):
            assert tf_argmax[b, t] == tokens[b, t], (b, t, tf_argmax[b], tokens[b])
            if tokens[b, t] == cfg.eos_token_id:
                break


def test_cross_scores_match_teacher_forcing_step0(setup):
    """First-step cross-attention logits from the decode loop must equal the
    teacher-forcing cross logits at position 0 (the reference's score_storage
    stores exactly this, src/model.py:327-329)."""
    model, cfg, params = setup
    fid = FiDT5(cfg)
    rs = np.random.default_rng(11)
    B, N, L = 2, 2, 6
    ids = rs.integers(2, 100, size=(B, N, L)).astype(np.int32)
    mask = np.ones((B, N, L), dtype=bool)

    gen = make_generate_fn(fid, max_length=5, collect_cross_scores=True)
    tokens, xl = gen(params, jnp.asarray(ids), jnp.asarray(mask))
    assert xl.shape == (B, cfg.num_decoder_layers, cfg.num_heads, N * L)

    labels = jnp.asarray(np.asarray(tokens).astype(np.int32))
    _, _, xl_tf = fid.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                            labels, collect_cross_logits=True)
    np.testing.assert_allclose(
        np.asarray(xl), np.asarray(xl_tf[:, :, :, 0, :]), atol=1e-4, rtol=1e-4
    )


def test_eos_padding(setup):
    model, cfg, params = setup
    fid = FiDT5(cfg)
    rs = np.random.default_rng(13)
    ids = rs.integers(2, 100, size=(1, 1, 6)).astype(np.int32)
    mask = np.ones((1, 1, 6), dtype=bool)
    tokens, _ = greedy_generate(fid, params, jnp.asarray(ids), jnp.asarray(mask),
                                max_length=20)
    toks = list(np.asarray(tokens)[0])
    if cfg.eos_token_id in toks:
        i = toks.index(cfg.eos_token_id)
        assert all(t == cfg.pad_token_id for t in toks[i + 1:])


def test_token_elimination(setup):
    """Token elimination keeps shapes static and selects the highest-salience
    encoder states; keep=full is a no-op on results."""
    from lako_tpu.models.t5.decode import eliminate_tokens

    model, cfg, params = setup
    fid = FiDT5(cfg)
    rs = np.random.default_rng(17)
    B, N, L = 2, 2, 8
    ids = rs.integers(2, 100, size=(B, N, L)).astype(np.int32)
    mask = np.ones((B, N, L), dtype=bool)

    full, _ = greedy_generate(fid, params, jnp.asarray(ids), jnp.asarray(mask),
                              max_length=6, keep_tokens=N * L)
    base, _ = greedy_generate(fid, params, jnp.asarray(ids), jnp.asarray(mask),
                              max_length=6)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(base))

    reduced, _ = greedy_generate(fid, params, jnp.asarray(ids), jnp.asarray(mask),
                                 max_length=6, keep_tokens=8)
    assert np.asarray(reduced).shape == np.asarray(base).shape

    # unit check of the selector
    enc = jnp.asarray(rs.normal(size=(1, 6, 4)).astype(np.float32))
    enc = enc.at[0, 3].set(100.0)  # dominant salience
    m = jnp.ones((1, 6), bool)
    kept, kept_mask = eliminate_tokens(enc, m, 2)
    assert kept.shape == (1, 2, 4)
    assert float(jnp.abs(kept[0]).max()) == 100.0

    # score capture + elimination must be rejected
    with pytest.raises(ValueError):
        greedy_generate(fid, params, jnp.asarray(ids), jnp.asarray(mask),
                        max_length=6, keep_tokens=4, collect_cross_scores=True)
