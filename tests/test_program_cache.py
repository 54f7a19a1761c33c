"""Program cache: repeated stage/loop invocations must reuse compiled
programs instead of retracing (the round-3 full loop's iteration 2 evaluated
4.4x slower than iteration 1 purely on recompiles —
artifacts/full_loop_r3_final.json)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lako_tpu.core import program_cache
from lako_tpu.core.config import (
    AttentionSignalConfig,
    OptimConfig,
    ReaderDataConfig,
    ReaderTrainConfig,
    T5Config,
)
from lako_tpu.models.t5 import FiDT5
from lako_tpu.models.t5.decode import (
    make_best_generate_fn,
    make_generate_and_score_fn,
)
from lako_tpu.train.optim import make_optimizer
from lako_tpu.train.reader import make_reader_train_step, train_reader

TINY = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                num_decoder_layers=1, num_heads=2,
                relative_attention_num_buckets=8, dropout_rate=0.0)


def test_generate_fn_identity_across_model_instances():
    """Two FiDT5 objects with equal fields → the SAME jitted callable."""
    f1 = make_best_generate_fn(FiDT5(TINY), max_length=4)
    f2 = make_best_generate_fn(FiDT5(TINY), max_length=4)
    assert f1 is f2
    # different knob → different program
    f3 = make_best_generate_fn(FiDT5(TINY), max_length=6)
    assert f3 is not f1
    # different architecture → different program
    other = TINY.replace(d_ff=128)
    f4 = make_best_generate_fn(FiDT5(other), max_length=4)
    assert f4 is not f1


def test_generate_and_score_fn_identity():
    sig = AttentionSignalConfig(n_context=2, stream=2)
    f1 = make_generate_and_score_fn(FiDT5(TINY), sig, max_length=4)
    f2 = make_generate_and_score_fn(FiDT5(TINY), sig, max_length=4)
    assert f1 is f2
    f3 = make_generate_and_score_fn(
        FiDT5(TINY), sig.replace(attention_score_style="max"), max_length=4)
    assert f3 is not f1


def test_optimizer_identity():
    """TrainState stores tx as a static field, so jit keys on its identity —
    equal configs must yield the same transformation object."""
    cfg = OptimConfig(optim="adamw", lr=1e-3, warmup_steps=2, total_steps=10,
                      scheduler="linear")
    assert make_optimizer(cfg) is make_optimizer(cfg)
    assert make_optimizer(cfg) is not make_optimizer(cfg.replace(lr=2e-3))


def test_train_step_identity():
    s1 = make_reader_train_step(FiDT5(TINY), backend="flax")
    s2 = make_reader_train_step(FiDT5(TINY), backend="flax")
    assert s1 is s2


def test_dense_index_search_program_shared():
    from lako_tpu.retrieval.index import DenseIndex

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(64, 8)).astype(np.float32)
    i1 = DenseIndex(emb, chunk_size=32)
    i2 = DenseIndex(emb.copy(), chunk_size=32)
    assert i1._search is i2._search


def test_no_retrace_across_loop_iterations():
    """Two train_reader invocations (= two full-loop iterations: fresh
    configs, fresh data, same shapes) compile the train step and the eval
    generate program exactly once."""
    from tests.fixtures import make_examples, make_tokenizer

    tok = make_tokenizer()
    t5_cfg = TINY.replace(vocab_size=tok.vocab_size)
    data_cfg = ReaderDataConfig(n_context=2, text_maxlength=16,
                                answer_maxlength=4, stream=2)
    cfg = ReaderTrainConfig(
        model_size="tiny", per_device_batch_size=1, eval_batch_size=8,
        epochs=1, early_stop=1, eval_max_length=4, use_remat=False,
        dtype="float32", data=data_cfg, decode_backend="flax",
        optim=OptimConfig(optim="adamw", lr=1e-3, weight_decay=0.0),
        checkpoint_dir="/tmp/pc_test", name="a")

    train1 = make_examples(8, 2, 0)
    train2 = make_examples(8, 2, 99)   # "iteration 2": different data
    evald = make_examples(8, 2, 7)

    r1 = train_reader(cfg.replace(name="it1"), train1, evald, tok,
                      t5_config=t5_cfg, save_checkpoints=False)
    stats_after_1 = program_cache.stats()
    r2 = train_reader(cfg.replace(name="it2"), train2, evald, tok,
                      t5_config=t5_cfg, save_checkpoints=False)
    stats_after_2 = program_cache.stats()

    # iteration 2 added NO new programs — everything was a cache hit
    assert stats_after_2["size"] == stats_after_1["size"]
    assert stats_after_2["hits"] > stats_after_1["hits"]

    # and the shared jitted callables compiled exactly once per shape
    model = FiDT5(t5_cfg, dtype=jnp.float32)
    step = make_reader_train_step(model)
    gen = make_best_generate_fn(model, max_length=cfg.eval_max_length,
                                backend="flax")
    assert step._cache_size() == 1
    assert gen._cache_size() == 1
    assert r1.final_step > 0 and r2.final_step > 0
