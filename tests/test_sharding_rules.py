"""Partition-spec rules and flash-flag fallback sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lako_tpu.core.config import ReaderDataConfig, T5Config
from lako_tpu.parallel.sharding import t5_partition_spec


class _K:
    def __init__(self, key):
        self.key = key


def _spec(*path):
    return t5_partition_spec(tuple(_K(k) for k in path))


def test_attention_kernels_column_sharded():
    for proj in ("q", "k", "v"):
        assert _spec("t5", "encoder", "block_0", "self_attn", proj, "kernel") \
            == P(None, "model")
    assert _spec("t5", "decoder", "block_1", "cross_attn", "o", "kernel") \
        == P("model", None)


def test_mlp_kernels():
    assert _spec("block_0", "mlp", "wi", "kernel") == P(None, "model")
    assert _spec("block_0", "mlp", "wi_0", "kernel") == P(None, "model")
    assert _spec("block_0", "mlp", "wo", "kernel") == P("model", None)


def test_embedding_and_norms():
    assert _spec("t5", "shared", "embedding") == P("model", None)
    assert _spec("encoder", "relpos", "rel_embedding") == P(None, "model")
    assert _spec("block_0", "ln_attn", "weight") == P()
    assert _spec("proj", "bias") == P()


def test_flash_flag_falls_back_off_tpu():
    """With use_flash_attention=True on CPU, the model must silently use the
    XLA path (supports_fused_attention gates the Pallas kernel)."""
    from lako_tpu.models.t5 import FiDT5

    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                   num_decoder_layers=1, num_heads=4,
                   relative_attention_num_buckets=8, dropout_rate=0.0,
                   use_flash_attention=True)
    cfg_off = cfg.replace(use_flash_attention=False)
    rs = np.random.default_rng(0)
    ids = jnp.asarray(rs.integers(2, 64, size=(1, 2, 8)).astype(np.int32))
    mask = jnp.ones((1, 2, 8), bool)
    labels = jnp.asarray(rs.integers(2, 64, size=(1, 4)).astype(np.int32))
    m_on, m_off = FiDT5(cfg), FiDT5(cfg_off)
    params = m_off.init(jax.random.PRNGKey(0), ids, mask, labels)["params"]
    loss_on, _, _ = m_on.apply({"params": params}, ids, mask, labels)
    loss_off, _, _ = m_off.apply({"params": params}, ids, mask, labels)
    assert float(loss_on) == pytest.approx(float(loss_off))


class TestCollatorRobustness:
    def test_unicode_and_empty_strings(self):
        from lako_tpu.data import ReaderCollator, ReaderDataset
        from tests.fixtures import make_tokenizer

        cfg = ReaderDataConfig(n_context=2, text_maxlength=12, answer_maxlength=4,
                               stream=2)
        tok = make_tokenizer()
        examples = [
            {"question": "", "target": "", "answer": {"": 1.0}, "img_id": "",
             "caption": "café ☕ naïve", "fact": [{"sentence": "", "id": 0}]},
            {"question": "?" * 100, "target": "a" * 200,
             "answer": {"x": 1.0}, "img_id": 1, "caption": "",
             "fact": [{"sentence": "日本語のテキスト。", "id": 1},
                      {"sentence": "ok.", "id": 2},
                      {"sentence": "extra beyond n_context.", "id": 3}]},
        ]
        ds = ReaderDataset(examples, cfg)
        batch = ReaderCollator(cfg, tok)([ds[0], ds[1]])
        assert batch.passage_ids.shape == (2, 2, 12)
        assert (batch.fact_spans[:, :, 1] <= 12).all()
        assert batch.labels.shape == (2, 4)
