"""Numeric parity of our flax T5 against the HF torch implementation.

A randomly-initialized small torch T5 is converted with ``params_from_torch_t5``;
encoder states, logits, and loss must match to float32 tolerance. This validates
both the architecture transcription and the checkpoint importer (reference
equivalent: load_t5, src/model.py:79-82).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lako_tpu.models.t5 import T5, FiDT5, params_from_torch_t5
from lako_tpu.models.t5.convert import fid_params_from_torch_t5, t5_config_from_hf


@pytest.fixture(scope="module")
def torch_t5():
    torch.manual_seed(0)
    hf_cfg = transformers.T5Config(
        vocab_size=100,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        dropout_rate=0.0,
        decoder_start_token_id=0,
    )
    model = transformers.T5ForConditionalGeneration(hf_cfg)
    model.eval()
    return model, hf_cfg


@pytest.fixture(scope="module")
def batch(rng=None):
    rs = np.random.default_rng(42)
    B, L, T = 3, 12, 6
    input_ids = rs.integers(2, 100, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), dtype=bool)
    mask[0, 9:] = False
    mask[2, 5:] = False
    input_ids[~mask] = 0
    labels = rs.integers(2, 100, size=(B, T)).astype(np.int32)
    labels[1, 4:] = -100
    return input_ids, mask, labels


def test_encoder_parity(torch_t5, batch):
    model, hf_cfg = torch_t5
    input_ids, mask, _ = batch
    cfg = t5_config_from_hf(hf_cfg)
    params = params_from_torch_t5(model.state_dict(), cfg)
    ours = T5(cfg)

    enc = ours.apply(
        {"params": params}, jnp.asarray(input_ids), jnp.asarray(mask),
        method=T5.encode,
    )
    with torch.no_grad():
        ref = model.encoder(
            input_ids=torch.tensor(input_ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    # only compare valid positions (HF computes garbage on masked ones too, but
    # identical garbage; compare everything for strictness)
    np.testing.assert_allclose(np.asarray(enc), ref, atol=2e-4, rtol=2e-3)


def test_logits_and_loss_parity(torch_t5, batch):
    model, hf_cfg = torch_t5
    input_ids, mask, labels = batch
    cfg = t5_config_from_hf(hf_cfg)
    params = params_from_torch_t5(model.state_dict(), cfg)
    ours = T5(cfg)

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(input_ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            labels=torch.tensor(labels, dtype=torch.long),
        )
    from lako_tpu.models.t5.model import shift_right

    dec_in = shift_right(jnp.asarray(labels), cfg.decoder_start_token_id, cfg.pad_token_id)
    logits, _ = ours.apply(
        {"params": params},
        jnp.asarray(input_ids), jnp.asarray(mask), dec_in,
    )
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(), atol=3e-4, rtol=2e-3)

    # loss parity through the FiD wrapper with N=1 passage
    fid = FiDT5(cfg)
    fid_params = fid_params_from_torch_t5(model.state_dict(), cfg)
    loss, fid_logits, _ = fid.apply(
        {"params": fid_params},
        jnp.asarray(input_ids)[:, None, :], jnp.asarray(mask)[:, None, :],
        jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(fid_logits), out.logits.numpy(), atol=3e-4, rtol=2e-3)
    np.testing.assert_allclose(float(loss), float(out.loss), atol=2e-4, rtol=1e-4)


def test_fid_passage_isolation(torch_t5):
    """FiD property: each passage is encoded independently — changing passage 2
    must not change passage 1's encoder states (src/model.py:227-234 semantics)."""
    model, hf_cfg = torch_t5
    cfg = t5_config_from_hf(hf_cfg)
    params = fid_params_from_torch_t5(model.state_dict(), cfg)
    fid = FiDT5(cfg)
    rs = np.random.default_rng(7)
    B, N, L = 2, 3, 8
    ids = rs.integers(2, 100, size=(B, N, L)).astype(np.int32)
    mask = np.ones((B, N, L), dtype=bool)

    enc1, _ = fid.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                        method=FiDT5.encode_passages)
    ids2 = ids.copy()
    ids2[:, 2, :] = rs.integers(2, 100, size=(B, L))
    enc2, _ = fid.apply({"params": params}, jnp.asarray(ids2), jnp.asarray(mask),
                        method=FiDT5.encode_passages)
    enc1 = np.asarray(enc1).reshape(B, N, L, -1)
    enc2 = np.asarray(enc2).reshape(B, N, L, -1)
    np.testing.assert_array_equal(enc1[:, :2], enc2[:, :2])
    assert np.abs(enc1[:, 2] - enc2[:, 2]).max() > 1e-3


def test_cross_logits_shape(torch_t5):
    model, hf_cfg = torch_t5
    cfg = t5_config_from_hf(hf_cfg)
    params = fid_params_from_torch_t5(model.state_dict(), cfg)
    fid = FiDT5(cfg)
    B, N, L, T = 2, 3, 8, 5
    rs = np.random.default_rng(3)
    ids = rs.integers(2, 100, size=(B, N, L)).astype(np.int32)
    mask = np.ones((B, N, L), dtype=bool)
    labels = rs.integers(2, 100, size=(B, T)).astype(np.int32)
    loss, logits, xl = fid.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels),
        collect_cross_logits=True,
    )
    assert xl.shape == (B, cfg.num_decoder_layers, cfg.num_heads, T, N * L)
