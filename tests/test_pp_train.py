"""Full-model pipeline-parallel training: parity vs single-device FiDT5.

VERDICT r2 #3: PP must be a capability, not a demo — encoder + decoder +
LM head + loss under the pipeline, microbatch grad accumulation inside the
schedule, 1/S parameter placement, and a trainable step that matches the
single-device loss/grads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.model import FiDT5
from lako_tpu.parallel.pp_train import (
    PPParams,
    fid_params_from_pp,
    make_pp_loss_fn,
    make_pp_train_step,
    place_pp_params,
    pp_params_from_fid,
)


def _setup(n_layers=4, B=4, N=2, L=8, T=6, seed=0, cfg_kwargs=None):
    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                   num_layers=n_layers, num_decoder_layers=n_layers,
                   num_heads=4, relative_attention_num_buckets=8,
                   dropout_rate=0.0, **(cfg_kwargs or {}))
    model = FiDT5(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(1, 64, size=(B, N, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, N, L)) < 0.9)
    labels = jnp.asarray(rng.integers(1, 64, size=(B, T)), jnp.int32)
    labels = labels.at[2:, T - 2:].set(-100)   # ragged -100 tail
    params = model.init(jax.random.PRNGKey(seed), ids, mask, labels)["params"]
    return cfg, model, params, ids, mask, labels


def _pipe_mesh(pipe=2, data=1):
    devs = np.asarray(jax.devices()[: pipe * data]).reshape(data, pipe)
    return Mesh(devs, ("data", "pipe"))


def test_pp_roundtrip_params():
    cfg, model, params, ids, mask, labels = _setup()
    pp = pp_params_from_fid(params, cfg, n_stages=2)
    back = fid_params_from_pp(pp, cfg)
    ref_leaves = jax.tree_util.tree_leaves_with_path(params)
    back_leaves = jax.tree_util.tree_leaves_with_path(back)
    assert len(ref_leaves) == len(back_leaves)
    ref_map = {str(k): v for k, v in ref_leaves}
    for k, v in back_leaves:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(ref_map[str(k)]), str(k))


@pytest.mark.parametrize("microbatches", [1, 2, 4])
def test_pp_loss_matches_single_device(microbatches):
    cfg, model, params, ids, mask, labels = _setup()
    ref_loss, _, _ = model.apply({"params": params}, ids, mask, labels)
    mesh = _pipe_mesh(pipe=2)
    pp = place_pp_params(mesh, pp_params_from_fid(params, cfg, 2))
    loss_fn = make_pp_loss_fn(mesh, cfg, microbatches)
    loss, logits = jax.jit(loss_fn)(pp, ids, mask, labels)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-5, atol=2e-6)


def test_pp_loss_gated_untied_4stage():
    cfg, model, params, ids, mask, labels = _setup(
        cfg_kwargs={"feed_forward_proj": "gated-gelu",
                    "tie_word_embeddings": False})
    ref_loss, _, _ = model.apply({"params": params}, ids, mask, labels)
    mesh = _pipe_mesh(pipe=4)
    pp = place_pp_params(mesh, pp_params_from_fid(params, cfg, 4))
    loss, _ = jax.jit(make_pp_loss_fn(mesh, cfg, 2))(pp, ids, mask, labels)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=2e-5, atol=2e-6)


def test_pp_grads_match_single_device():
    """The microbatched, pipelined backward accumulates to the same grads as
    the plain FiDT5 step — checked on the canonical tree after unstacking."""
    cfg, model, params, ids, mask, labels = _setup()

    def ref_lf(p):
        loss, _, _ = model.apply({"params": p}, ids, mask, labels)
        return loss

    ref_grads = jax.grad(ref_lf)(params)

    mesh = _pipe_mesh(pipe=2)
    pp = place_pp_params(mesh, pp_params_from_fid(params, cfg, 2))
    loss_fn = make_pp_loss_fn(mesh, cfg, 2)

    def pp_lf(p):
        return loss_fn(p, ids, mask, labels)[0]

    pp_grads = jax.jit(jax.grad(pp_lf))(pp)
    back = fid_params_from_pp(pp_grads, cfg)
    ref_map = {str(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(ref_grads)}
    n = 0
    for k, v in jax.tree_util.tree_leaves_with_path(back):
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_map[str(k)]),
                                   rtol=5e-4, atol=1e-5, err_msg=str(k))
        n += 1
    assert n == len(ref_map)


def test_pp_params_one_over_s_per_device():
    """Each pipe device must hold exactly 1/S of every block-stack leaf."""
    cfg, model, params, ids, mask, labels = _setup()
    mesh = _pipe_mesh(pipe=2)
    pp = place_pp_params(mesh, pp_params_from_fid(params, cfg, 2))
    for leaf in jax.tree_util.tree_leaves(pp.enc) + \
            jax.tree_util.tree_leaves(pp.dec):
        shards = leaf.addressable_shards
        assert len(shards) == 2
        for s in shards:
            assert s.data.size == leaf.size // 2
    for leaf in jax.tree_util.tree_leaves(pp.shared):
        for s in leaf.addressable_shards:
            assert s.data.size == leaf.size      # replicated


def test_pp_train_step_trains_and_composes_with_dp():
    """One jitted PP(+DP) step on a pipe=2 x data=2 mesh: finite loss that
    decreases over a few steps, optimizer state in the PP layout."""
    import optax

    from lako_tpu.train.state import TrainState

    cfg, model, params, ids, mask, labels = _setup()
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "pipe"))
    pp = place_pp_params(mesh, pp_params_from_fid(params, cfg, 2))
    state = TrainState.create(pp, optax.adamw(1e-3))
    step = make_pp_train_step(mesh, cfg, n_microbatches=2,
                              data_axis="data")
    losses = []
    for _ in range(5):
        state, loss = step(state, ids, mask, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # optimizer state mirrors the 1/S placement of the block stacks
    # (4 addressable shards on the 2x2 mesh: sharded over pipe, replicated
    # over data — each holds half the leaf)
    mu = jax.tree_util.tree_leaves(state.opt_state[0].mu.enc)[0]
    assert len(mu.addressable_shards) == 4
    assert all(s.data.size == mu.size // 2 for s in mu.addressable_shards)


def test_pp_checkpoint_resume_restores_optimizer(tmp_path):
    """PP training saves canonical params + PP-layout optimizer state;
    resume with reset_params=False restores step and moments."""
    from lako_tpu.core.config import ReaderTrainConfig
    from lako_tpu.text.tokenizer import WordVocabTokenizer
    from lako_tpu.train.reader import train_reader

    exs = [{"question": f"is item {i} on", "target": "yes" if i % 2 else "no",
            "answer": {"yes" if i % 2 else "no": 1.0}, "caption": "a board.",
            "fact": [{"sentence": "items toggle.", "id": 0}]}
           for i in range(16)]
    tok = WordVocabTokenizer.build(
        [e["question"] for e in exs]
        + ["yes no a board. items toggle. question: context: fact:"])
    mk = lambda epochs: ReaderTrainConfig.from_dict({
        "model_size": "tiny", "per_device_batch_size": 2, "eval_batch_size": 8,
        "epochs": epochs, "early_stop": 9, "eval_max_length": 4,
        "use_remat": False, "dtype": "float32", "pp_microbatches": 2,
        "mesh": {"pipe": 2, "data": 4},
        "data": {"n_context": 1, "text_maxlength": 16, "answer_maxlength": 4,
                 "stream": 2},
        "optim": {"optim": "adamw", "lr": 3e-3},
        "checkpoint_dir": str(tmp_path), "name": "ppr"})
    r1 = train_reader(mk(1), exs, exs[:8], tok, save_checkpoints=True)
    assert r1.final_step > 0
    r2 = train_reader(mk(2), exs, exs[:8], tok, save_checkpoints=False,
                      resume_from=str(tmp_path / "ppr"),
                      reset_params=False)
    # step carried over, optimizer moments restored (nonzero first moment)
    assert r2.final_step > r1.final_step
    assert int(r2.state.step) >= r1.final_step
    adam = next(s for s in r2.state.opt_state if hasattr(s, "mu"))
    mu = jax.tree_util.tree_leaves(adam.mu.enc)[0]
    assert float(jnp.abs(mu).sum()) > 0.0
