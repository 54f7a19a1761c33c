"""Flax LXMERT numeric parity vs the HF torch implementation.

The reference uses HF LxmertForQuestionAnswering on GPU
(data_process/model/lxmert.py:6-85); our TPU-native flax rebuild must match
it numerically through the weight importer (random-init HF model — no
pretrained weights exist in this environment, same strategy as
test_t5_parity.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lako_tpu.core.config import lxmert_config_tiny
from lako_tpu.models.lxmert import (LxmertForQA, LxmertModel,
                                    lxmert_params_from_state_dict,
                                    lxmert_qa_params_from_state_dict)


def _hf_pair(num_labels=7, seed=0):
    from transformers import LxmertConfig as HFConfig
    from transformers import LxmertForQuestionAnswering

    cfg = lxmert_config_tiny()
    torch.manual_seed(seed)
    hf = LxmertForQuestionAnswering(HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        l_layers=cfg.l_layers, x_layers=cfg.x_layers, r_layers=cfg.r_layers,
        visual_feat_dim=cfg.visual_feat_dim,
        visual_pos_dim=cfg.visual_pos_dim, num_qa_labels=num_labels))
    hf.eval()
    return cfg, hf


def _inputs(cfg, B=3, L=11, V=5, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, cfg.vocab_size, size=(B, L))
    mask = (rng.random((B, L)) < 0.9)
    mask[:, 0] = True
    types = rng.integers(0, cfg.type_vocab_size, size=(B, L))
    feats = rng.normal(size=(B, V, cfg.visual_feat_dim)).astype(np.float32)
    boxes = rng.random((B, V, cfg.visual_pos_dim)).astype(np.float32)
    return ids, mask, types, feats, boxes


def test_qa_logits_match_hf():
    cfg, hf = _hf_pair()
    ids, mask, types, feats, boxes = _inputs(cfg)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 token_type_ids=torch.tensor(types),
                 visual_feats=torch.tensor(feats),
                 visual_pos=torch.tensor(boxes)
                 )["question_answering_score"].numpy()

    model = LxmertForQA(cfg, num_labels=7, dtype=jnp.float32)
    params = lxmert_qa_params_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    out = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(feats), jnp.asarray(boxes),
                      jnp.asarray(mask), jnp.asarray(types))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_encoder_states_match_hf():
    cfg, hf = _hf_pair(seed=2)
    ids, mask, types, feats, boxes = _inputs(cfg, seed=3)
    with torch.no_grad():
        ref = hf.lxmert(input_ids=torch.tensor(ids),
                        attention_mask=torch.tensor(mask.astype(np.int64)),
                        token_type_ids=torch.tensor(types),
                        visual_feats=torch.tensor(feats),
                        visual_pos=torch.tensor(boxes))
    model = LxmertModel(cfg, dtype=jnp.float32)
    params = lxmert_params_from_state_dict(
        {k: v.numpy() for k, v in hf.lxmert.state_dict().items()}, cfg)
    lang, visn, pooled = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(feats),
        jnp.asarray(boxes), jnp.asarray(mask), jnp.asarray(types))
    np.testing.assert_allclose(np.asarray(lang),
                               ref.language_output.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(visn), ref.vision_output.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooled_output.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_cross_attention_outputs_match_hf():
    """The reference's output_attention path returns the lang→visual cross
    probs (lxmert.py:64-84); ours must match HF's cross_encoder_attentions."""
    cfg, hf = _hf_pair(seed=4)
    ids, mask, types, feats, boxes = _inputs(cfg, seed=5)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 token_type_ids=torch.tensor(types),
                 visual_feats=torch.tensor(feats),
                 visual_pos=torch.tensor(boxes), output_attentions=True)
    model = LxmertForQA(cfg, num_labels=7, dtype=jnp.float32)
    params = lxmert_qa_params_from_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    logits, cross = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(feats),
        jnp.asarray(boxes), jnp.asarray(mask), jnp.asarray(types),
        output_attentions=True)
    assert len(cross) == cfg.x_layers
    for ours, theirs in zip(cross, ref.cross_encoder_attentions):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits),
                               ref["question_answering_score"].numpy(),
                               rtol=2e-4, atol=2e-4)


def test_save_pretrained_roundtrip(tmp_path):
    cfg, hf = _hf_pair(seed=6)
    hf.save_pretrained(tmp_path, safe_serialization=False)
    from lako_tpu.models.lxmert import load_lxmert_pretrained

    loaded_cfg, params, num_labels = load_lxmert_pretrained(str(tmp_path))
    assert loaded_cfg == cfg and num_labels == 7
    ids, mask, types, feats, boxes = _inputs(cfg, seed=7)
    model = LxmertForQA(cfg, num_labels=7, dtype=jnp.float32)
    out = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(feats), jnp.asarray(boxes),
                      jnp.asarray(mask), jnp.asarray(types))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask.astype(np.int64)),
                 token_type_ids=torch.tensor(types),
                 visual_feats=torch.tensor(feats),
                 visual_pos=torch.tensor(boxes)
                 )["question_answering_score"].numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_runner_matches_torch_adapter():
    """LxmertVQARunner (TPU-native) must reproduce the host-torch adapter's
    logits on identical weights, tokenizer, and fact pairing."""
    from tests.fixtures import make_tokenizer

    from lako_tpu.core.config import LxmertConfig
    from lako_tpu.models.lxmert import (LxmertVQARunner,
                                        lxmert_qa_params_from_state_dict)
    from lako_tpu.models.lxmert_adapter import LxmertVQAAdapter

    tok = make_tokenizer(style="bert")
    torch.manual_seed(0)
    adapter = LxmertVQAAdapter(
        num_labels=7, tokenizer=tok,
        config_overrides=dict(
            vocab_size=tok.vocab_size + 10, hidden_size=32,
            num_attention_heads=2, l_layers=1, x_layers=1, r_layers=1,
            visual_feat_dim=16, intermediate_size=64, num_qa_labels=7),
        max_length=16)
    cfg = LxmertConfig(vocab_size=tok.vocab_size + 10, hidden_size=32,
                       num_attention_heads=2, l_layers=1, x_layers=1,
                       r_layers=1, visual_feat_dim=16, intermediate_size=64)
    params = lxmert_qa_params_from_state_dict(
        {k: v.numpy() for k, v in adapter.model.state_dict().items()}, cfg)
    runner = LxmertVQARunner(cfg, params, num_labels=7, tokenizer=tok,
                             max_length=16)

    feats = np.random.default_rng(0).normal(size=(2, 4, 16)).astype(np.float32)
    boxes = np.random.default_rng(1).random(size=(2, 4, 4)).astype(np.float32)
    sents = ["what sound does the cat make?"] * 2
    np.testing.assert_allclose(runner(feats, boxes, sents),
                               adapter(feats, boxes, sents),
                               rtol=2e-4, atol=2e-4)
    facts = ["cat says meow."] * 2
    np.testing.assert_allclose(runner(feats, boxes, sents, facts),
                               adapter(feats, boxes, sents, facts),
                               rtol=2e-4, atol=2e-4)
