"""Coverage for small utilities: profiling timer, compilation cache switch,
tokenizer loader dispatch, beam-serving path."""

import os

import numpy as np
import pytest


def test_step_timer():
    from lako_tpu.core.profiling import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(3):
        t.start()
        t.stop()
    assert t.count == 3
    assert t.mean >= 0.0


def test_trace_noop():
    from lako_tpu.core.profiling import trace

    with trace(None):
        pass  # must be a clean no-op


def test_cache_opt_out(monkeypatch, tmp_path):
    import lako_tpu.core.cache as cache

    monkeypatch.setattr(cache, "_enabled", False)
    monkeypatch.setenv("LAKO_NO_COMPILATION_CACHE", "1")
    assert cache.enable_compilation_cache(str(tmp_path)) is False


def test_load_tokenizer_dispatch(tmp_path):
    from lako_tpu.text.tokenizer import WordVocabTokenizer, load_tokenizer

    tok = WordVocabTokenizer.build(["a cat sits"], style="t5")
    tok.save(str(tmp_path / "word_vocab.json"))
    # via directory
    t2 = load_tokenizer(str(tmp_path))
    assert t2.encode("a cat") == tok.encode("a cat")
    # via file
    t3 = load_tokenizer(str(tmp_path / "word_vocab.json"))
    assert t3.vocab_size == tok.vocab_size


def test_service_beam_path():
    import jax
    import jax.numpy as jnp

    from lako_tpu.core.config import ReaderDataConfig, T5Config
    from lako_tpu.models.t5 import FiDT5
    from lako_tpu.serve import LakoService, ServiceConfig
    from tests.fixtures import make_tokenizer

    tok = make_tokenizer()
    t5 = T5Config(vocab_size=tok.vocab_size, d_model=32, d_kv=8, d_ff=64,
                  num_layers=1, num_decoder_layers=1, num_heads=2,
                  relative_attention_num_buckets=8, dropout_rate=0.0)
    data_cfg = ReaderDataConfig(n_context=2, text_maxlength=16,
                                answer_maxlength=4, stream=2)
    model = FiDT5(t5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 16), jnp.int32),
                        jnp.ones((1, 2, 16), bool),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    svc = LakoService(
        ServiceConfig(batch_size=2, max_length=4, n_context=2, data=data_cfg,
                      dtype="float32", num_beams=2),
        t5, params, tok,
    )
    out = svc.answer("what sound does the cat make?", "a cat.",
                     facts=[{"sentence": "cat says meow.", "id": 0}])
    assert isinstance(out["answer"], str)


def test_config_json_roundtrips():
    from lako_tpu.core.config import (
        ReaderTrainConfig,
        RetrieverTrainConfig,
        T5Config,
    )
    import json as _json

    for cls in (ReaderTrainConfig, RetrieverTrainConfig, T5Config):
        cfg = cls()
        again = cls.from_dict(_json.loads(cfg.to_json()))
        assert again == cfg, cls.__name__


def test_t5_size_presets():
    from lako_tpu.core.config import t5_config_for_size

    large = t5_config_for_size("large")
    assert (large.d_model, large.num_layers, large.num_heads) == (1024, 24, 16)
    small = t5_config_for_size("small", vocab_size=123)
    assert small.vocab_size == 123 and small.d_ff == 2048


def test_tokenizer_empty_and_long():
    from tests.fixtures import make_tokenizer

    tok = make_tokenizer()
    assert tok.encode("", add_special=False) == []
    ids, mask = tok.batch_encode([""], 4)
    assert mask[0].sum() == 1  # just EOS
    ids2, mask2 = tok.batch_encode(["cat " * 500], 8)
    assert mask2[0].all()


def test_mesh_config_explicit_axes():
    from lako_tpu.core.config import MeshConfig
    from lako_tpu.core.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4))
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    with __import__("pytest").raises(ValueError):
        make_mesh(MeshConfig(data=3, model=4))
