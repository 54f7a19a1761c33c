"""Checkpoint resume and preemption handling."""

import os
import signal

import numpy as np
import pytest

from lako_tpu.core import preemption
from lako_tpu.core.config import (
    OptimConfig,
    ReaderDataConfig,
    ReaderTrainConfig,
    T5Config,
)
from lako_tpu.core.distributed import average_main, weighted_average
from lako_tpu.train.reader import train_reader
from tests.fixtures import make_examples, make_tokenizer


def _cfg(tmp_path, epochs=2, name="run"):
    return ReaderTrainConfig(
        per_device_batch_size=1, eval_batch_size=8, epochs=epochs,
        early_stop=99, eval_max_length=4, use_remat=False, dtype="float32",
        data=ReaderDataConfig(n_context=2, text_maxlength=20, answer_maxlength=4,
                              stream=2),
        optim=OptimConfig(optim="adamw", lr=5e-3, weight_decay=0.0),
        checkpoint_dir=str(tmp_path), name=name,
    )


T5_TINY = dict(d_model=32, d_kv=8, d_ff=64, num_layers=1, num_decoder_layers=1,
               num_heads=4, relative_attention_num_buckets=8, dropout_rate=0.0)


def test_single_process_aggregation():
    assert average_main(3.0) == 3.0
    assert weighted_average(0.5, 10) == (0.5, 10)


def test_resume_restores_step_and_metric(tmp_path):
    tok = make_tokenizer()
    t5 = T5Config(vocab_size=tok.vocab_size, **T5_TINY)
    train, evald = make_examples(16, 2, 0), make_examples(8, 2, 9)
    r1 = train_reader(_cfg(tmp_path, epochs=2), train, evald, tok, t5_config=t5)
    assert (tmp_path / "run" / "checkpoint" / "latest").exists()
    assert (tmp_path / "run" / "checkpoint" / "last" / "params.msgpack").exists()

    # warm start (reset_params=True): step starts at 0
    r2 = train_reader(_cfg(tmp_path, epochs=1, name="warm"), train, evald, tok,
                      t5_config=t5,
                      resume_from=str(tmp_path / "run" / "checkpoint" / "last"),
                      reset_params=True)
    # 16 examples / (1 per-device x 8 devices) = 2 steps per epoch, fresh counter
    assert r2.final_step == 2

    # full resume: step and best metric restored
    r3 = train_reader(_cfg(tmp_path, epochs=1, name="resume"), train, evald, tok,
                      t5_config=t5,
                      resume_from=str(tmp_path / "run" / "checkpoint" / "last"),
                      reset_params=False)
    assert r3.final_step == r1.final_step + 2  # continued from restored counter


def test_preemption_checkpoints_and_exits(tmp_path):
    tok = make_tokenizer()
    t5 = T5Config(vocab_size=tok.vocab_size, **T5_TINY)
    preemption.install_handlers()
    os.kill(os.getpid(), signal.SIGUSR1)  # flag set before the loop starts
    assert preemption.preempted()
    with pytest.raises(SystemExit):
        train_reader(_cfg(tmp_path, epochs=3, name="pre"), make_examples(16, 2, 0),
                     make_examples(8, 2, 9), tok, t5_config=t5)
    assert (tmp_path / "pre" / "checkpoint" / "preempted" / "params.msgpack").exists()
    preemption.reset()
    signal.signal(signal.SIGTERM, signal.SIG_DFL)


def test_sigterm_ignored_by_default():
    preemption.install_handlers(trap_sigterm=False)
    os.kill(os.getpid(), signal.SIGTERM)
    assert not preemption.preempted()
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    preemption.reset()


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from lako_tpu.core.checkpoint_orbax import OrbaxCheckpointManager

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    opt = {"mu": jnp.zeros((2, 3))}
    mgr = OrbaxCheckpointManager(str(tmp_path / "run"), use_async=True)
    mgr.save("best_dev", params, opt, step=7, best_eval_metric=0.42)
    mgr.wait()
    template = {"w": jnp.zeros((2, 3)), "b": jnp.zeros(3)}
    p2, o2, meta = mgr.restore("best_dev", template, {"mu": jnp.ones((2, 3))})
    np.testing.assert_allclose(np.asarray(p2["w"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(o2["mu"]), 0.0)
    assert meta == {"step": 7, "best_eval_metric": 0.42}
    mgr.close()


def test_orbax_sharded_roundtrip():
    """Orbax must save/restore arrays that live sharded on the mesh (multi-host
    checkpoint readiness)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lako_tpu.core.checkpoint_orbax import OrbaxCheckpointManager
    from lako_tpu.core.config import MeshConfig
    from lako_tpu.core.mesh import make_mesh

    mesh = make_mesh(MeshConfig(model=2))
    w = jnp.arange(64.0).reshape(8, 8)
    sharded = jax.device_put(w, NamedSharding(mesh, P("data", "model")))
    with tempfile.TemporaryDirectory() as td:
        mgr = OrbaxCheckpointManager(td, use_async=False)
        mgr.save("best_dev", {"w": sharded}, step=3)
        template = jax.device_put(jnp.zeros((8, 8)),
                                  NamedSharding(mesh, P("data", "model")))
        restored, _, meta = mgr.restore("best_dev", {"w": template})
        np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(w))
        assert restored["w"].sharding.spec == P("data", "model")
        assert meta["step"] == 3
        mgr.close()
