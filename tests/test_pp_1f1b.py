"""1F1B pipeline schedule: grads parity vs single-device FiDT5 + GPipe.

The 1F1B step (parallel/pp_1f1b.py) interleaves each microbatch's backward
behind its forward so activation memory is O(S) instead of GPipe's O(M).
These tests pin (a) the static schedule's structural invariants for a range
of (S, M), and (b) loss + grad parity against the plain single-device
``FiDT5.apply`` — the same oracle the GPipe tests use.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lako_tpu.parallel.pp_1f1b import (build_schedule,
                                       make_pp_1f1b_loss_and_grads)
from lako_tpu.parallel.pp_train import (fid_params_from_pp, place_pp_params,
                                        pp_params_from_fid)
from tests.test_pp_train import _pipe_mesh, _setup


@pytest.mark.parametrize("S,M", [(2, 1), (2, 2), (2, 5), (3, 4), (4, 3),
                                 (4, 8), (5, 2), (8, 4)])
def test_schedule_structure(S, M):
    """Every unit placed exactly once (collisions assert inside), parked
    hand-offs ordered before their consumption, and table shapes agree."""
    sch = build_schedule(S, M)   # collision assert runs during construction
    # each microbatch contributes S units of each of the 4 types
    assert (sch.f_code == 1).sum() == S * M    # EF
    assert (sch.f_code == 2).sum() == S * M    # DF
    assert (sch.b_code == 1).sum() == S * M    # DB
    assert (sch.b_code == 2).sum() == S * M    # EB
    g = (S + 1) % 2
    for m in range(M):
        a = 2 * m
        # DF(0) consumes the parked enc_out at a+S+g; parked at a+S
        assert sch.park_f[a + S, 0] == 1
        assert sch.f_code[a + S + g, 0] == 2 and sch.f_m[a + S + g, 0] == m
        # EB(S-1) consumes the parked d_enc at a+E; parked at a+C+S
        C = 2 * S + g + 1
        E = C + S + g
        assert sch.park_b[a + C + S, S - 1] == 1
        assert sch.b_code[a + E, S - 1] == 2 and sch.b_m[a + E, S - 1] == m


def test_schedule_rejects_bad_shapes():
    with pytest.raises(ValueError):
        build_schedule(1, 4)
    with pytest.raises(ValueError):
        build_schedule(2, 0)


def _grad_parity(cfg, model, params, ids, mask, labels, mesh, M,
                 data_axis=None, rtol=5e-4, atol=1e-5):
    def ref_lf(p):
        loss, _, _ = model.apply({"params": p}, ids, mask, labels)
        return loss

    ref_loss = float(ref_lf(params))
    ref_grads = jax.grad(ref_lf)(params)

    S = mesh.shape["pipe"]
    pp = place_pp_params(mesh, pp_params_from_fid(params, cfg, S))
    fn = make_pp_1f1b_loss_and_grads(mesh, cfg, M, data_axis=data_axis)
    loss, grads = jax.jit(fn)(pp, ids, mask, labels)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=2e-5, atol=2e-6)

    back = fid_params_from_pp(grads, cfg)
    ref_map = {str(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(ref_grads)}
    n = 0
    for k, v in jax.tree_util.tree_leaves_with_path(back):
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_map[str(k)]),
                                   rtol=rtol, atol=atol, err_msg=str(k))
        n += 1
    assert n == len(ref_map)


@pytest.mark.parametrize("M", [1, 2, 4])
def test_1f1b_grads_match_single_device(M):
    cfg, model, params, ids, mask, labels = _setup()
    _grad_parity(cfg, model, params, ids, mask, labels,
                 _pipe_mesh(pipe=2), M)


def test_1f1b_gated_untied_4stage():
    cfg, model, params, ids, mask, labels = _setup(
        cfg_kwargs={"feed_forward_proj": "gated-gelu",
                    "tie_word_embeddings": False})
    _grad_parity(cfg, model, params, ids, mask, labels,
                 _pipe_mesh(pipe=4), 2)


def test_1f1b_odd_stage_count():
    """S=3 exercises the g=0 parity (same-tick park-then-consume)."""
    cfg, model, params, ids, mask, labels = _setup(n_layers=3)
    devs = np.asarray(jax.devices()[:3]).reshape(1, 3)
    _grad_parity(cfg, model, params, ids, mask, labels,
                 Mesh(devs, ("data", "pipe")), 2)


def test_1f1b_composes_with_dp():
    cfg, model, params, ids, mask, labels = _setup(B=4)
    _grad_parity(cfg, model, params, ids, mask, labels,
                 _pipe_mesh(pipe=2, data=2), 2, data_axis="data")


def test_1f1b_train_step_trains():
    """make_pp_train_step(schedule='1f1b'): losses fall and match the GPipe
    step's losses step-for-step (same grads -> same trajectory)."""
    import optax

    from lako_tpu.parallel.pp_train import make_pp_train_step
    from lako_tpu.train.state import TrainState

    cfg, model, params, ids, mask, labels = _setup()
    mesh = _pipe_mesh(pipe=2, data=2)

    def run(schedule):
        # donation of the train state deletes the placed buffers, and
        # device_put-to-replicated can alias the source leaf on the CPU
        # mesh — give each run its own host copy of the params
        p = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)),
                                   params)
        pp = place_pp_params(mesh, pp_params_from_fid(p, cfg, 2))
        state = TrainState.create(pp, optax.adamw(1e-3))
        step = make_pp_train_step(mesh, cfg, n_microbatches=2,
                                  data_axis="data", schedule=schedule)
        losses = []
        for _ in range(4):
            state, loss = step(state, ids, mask, labels)
            losses.append(float(loss))
        return losses

    l_1f1b = run("1f1b")
    l_gpipe = run("gpipe")
    assert all(np.isfinite(l_1f1b))
    assert l_1f1b[-1] < l_1f1b[0]
    np.testing.assert_allclose(l_1f1b, l_gpipe, rtol=1e-4, atol=1e-6)


def test_1f1b_reader_end_to_end():
    """ReaderTrainConfig.pp_schedule='1f1b' routes train_reader through the
    wavefront step: one epoch on the tiny fixture trains to a finite,
    falling loss with eval decode working off the canonical tree."""
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
    cfg = ReaderTrainConfig.from_dict({
        "model_size": "tiny", "per_device_batch_size": 2, "eval_batch_size": 8,
        "epochs": 2, "early_stop": 9, "eval_max_length": 4,
        "use_remat": False, "dtype": "float32", "pp_microbatches": 2,
        "pp_schedule": "1f1b", "mesh": {"pipe": 2, "data": 4},
        "data": {"n_context": 1, "text_maxlength": 16, "answer_maxlength": 4,
                 "stream": 2},
        "optim": {"optim": "adamw", "lr": 3e-3},
        "checkpoint_dir": "/tmp/unused", "name": "pp1f1b"})
    res = train_reader(cfg, exs, exs[:8], tok, save_checkpoints=False)
    assert res.final_step > 0
    losses = [h["loss"] for h in res.history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
