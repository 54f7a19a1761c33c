"""FiDO-style decoder options (PAPERS.md: arXiv 2212.08153): layer-sparse
cross-attention + multi-query cross-attention. Defaults-off parity is covered
by the HF tests; here the variants must be internally consistent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5 import FiDT5
from lako_tpu.models.t5.decode import greedy_generate


def make_model(stride=None, mqa=False):
    cfg = T5Config(
        vocab_size=80, d_model=48, d_kv=12, d_ff=96,
        num_layers=2, num_decoder_layers=4, num_heads=4,
        relative_attention_num_buckets=8, dropout_rate=0.0,
        cross_attention_stride=stride, multiquery_cross_attention=mqa,
    )
    model = FiDT5(cfg)
    rs = np.random.default_rng(0)
    B, N, L, T = 2, 2, 10, 5
    ids = jnp.asarray(rs.integers(2, 80, size=(B, N, L)).astype(np.int32))
    mask = jnp.ones((B, N, L), bool)
    labels = jnp.asarray(rs.integers(2, 80, size=(B, T)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), ids, mask, labels)["params"]
    return cfg, model, params, ids, mask, labels


def test_stride_selects_layers():
    cfg, *_ = make_model(stride=2)
    has = [cfg.has_cross_attention(i) for i in range(4)]
    assert has == [False, True, False, True]  # last layer always keeps cross


def test_lsa_param_tree_and_cross_logits():
    cfg, model, params, ids, mask, labels = make_model(stride=2)
    dec = params["t5"]["decoder"]
    assert "cross_attn" not in dec["block_0"]
    assert "cross_attn" in dec["block_1"]
    loss, logits, xl = model.apply({"params": params}, ids, mask, labels,
                                   collect_cross_logits=True)
    assert np.isfinite(float(loss))
    assert xl.shape[1] == 2  # only the 2 cross layers contribute


def test_mqa_param_shapes():
    cfg, model, params, *_ = make_model(mqa=True)
    ca = params["t5"]["decoder"]["block_0"]["cross_attn"]
    assert ca["k"]["kernel"].shape == (48, 12)   # single kv head
    assert ca["q"]["kernel"].shape == (48, 48)   # full query heads


@pytest.mark.parametrize("stride,mqa", [(2, False), (None, True), (2, True)])
def test_decode_matches_teacher_forcing(stride, mqa):
    cfg, model, params, ids, mask, labels = make_model(stride=stride, mqa=mqa)
    tokens, xl = greedy_generate(model, params, ids, mask, max_length=6,
                                 collect_cross_scores=True)
    tokens = np.asarray(tokens)
    _, tf_logits, _ = model.apply({"params": params}, ids, mask,
                                  jnp.asarray(tokens.astype(np.int32)))
    tf_argmax = np.asarray(jnp.argmax(tf_logits, axis=-1))
    for b in range(tokens.shape[0]):
        for t in range(tokens.shape[1]):
            assert tf_argmax[b, t] == tokens[b, t], (b, t)
            if tokens[b, t] == cfg.eos_token_id:
                break


def test_grads_flow():
    cfg, model, params, ids, mask, labels = make_model(stride=2, mqa=True)

    def loss_fn(p):
        loss, _, _ = model.apply({"params": p}, ids, mask, labels)
        return loss

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0
