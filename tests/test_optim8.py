"""8-bit Adam (train/optim8.py): quantization, EMA tracking, trajectories.

The risky part of 1-byte moments is not the rounding error itself but EMA
freeze: per-step moment updates (~0.1%) are far below int8 resolution
(~0.8% of blockmax), so nearest rounding pins the state to its lattice.
These tests pin (a) stochastic rounding is unbiased and lets the EMA
converge to the fixed point, (b) the optimizer's training trajectory tracks
f32 AdamW on a real (tiny-FiD) loss, (c) the 4x state-memory claim, and
(d) the config routing through make_optimizer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from lako_tpu.core.config import OptimConfig
from lako_tpu.train.optim import make_optimizer
from lako_tpu.train.optim8 import (Moment8, ScaleByAdam8State, _blocked,
                                   _dequant, _quant_signed, _quant_unsigned,
                                   moment_state_bytes, scale_by_adam_8bit)


def test_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(7, 130)).astype(np.float32))  # ragged
    x2d = _blocked(x, 256)
    m = _quant_signed(x2d, None)
    err = np.abs(np.asarray(_dequant(m) - x2d))
    step = np.asarray(m.scale)            # one lattice step per block
    assert (err <= 0.5 * step + 1e-7).all()


def test_log_code_covers_wide_dynamic_range():
    """The v code must represent g^2 spanning many orders of magnitude
    within one block at ~4.4% nearest-rounding relative error — the case a
    linear code collapses to zero."""
    vals = 10.0 ** np.linspace(-9, 0, 256)
    x2d = jnp.asarray(vals[None].astype(np.float32))
    out = np.asarray(_dequant(_quant_unsigned(x2d, None)))[0]
    np.testing.assert_allclose(out, vals, rtol=2 ** (1 / 16.0) - 1 + 1e-6)
    # exact zero round-trips through the reserved symbol
    z = _quant_unsigned(jnp.zeros((1, 256)), None)
    assert (np.asarray(_dequant(z)) == 0).all()


def test_stochastic_rounding_is_unbiased():
    # one 127.0 inside the block pins scale=1; the rest sit at 0.3 — between
    # lattice points 0 and 1, where nearest rounding would deterministically
    # give 0 but stochastic rounding must average to 0.3 over steps
    from lako_tpu.train.optim8 import _dither

    x2d = jnp.full((1, 256), 0.3).at[0, 0].set(127.0)
    vals = []
    for s in range(64):
        m = _quant_signed(x2d, _dither(x2d.shape, s, 7))
        vals.append(float(np.asarray(_dequant(m))[0, 1:].mean()))
    assert abs(np.mean(vals) - 0.3) < 0.02
    assert np.std(vals) > 0          # it actually randomizes


def test_fused_kernel_matches_jnp_path():
    """The Pallas kernel (interpret-mode here) must produce bit-identical
    updates AND quantized states to the jnp fallback — same dither hash,
    same quantization lattice — over several steps of a real trajectory."""
    rng = np.random.default_rng(3)
    params = {"w": jnp.asarray(rng.normal(size=(512,)).astype(np.float32)),
              "e": jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))}

    def drive(use_kernel):
        tx = scale_by_adam_8bit(use_kernel=use_kernel)
        state = tx.init(params)
        up = jax.jit(tx.update)
        for s in range(5):
            g = jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    np.random.default_rng(s).normal(size=p.shape)
                    .astype(np.float32)), params)
            u, state = up(g, state)
        return u, state

    u_k, st_k = drive("always")
    u_j, st_j = drive("never")
    for a, b in zip(jax.tree_util.tree_leaves((u_k, st_k)),
                    jax.tree_util.tree_leaves((u_j, st_j))):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype in (np.int8, np.uint8, np.int32):
            # the quantized states and step count must agree EXACTLY —
            # one code of drift would compound over steps
            np.testing.assert_array_equal(a, b, err_msg=str(a.dtype))
        else:
            # float outputs may differ by FMA-contraction ulps between the
            # interpret-mode kernel and XLA
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-30)


def test_dither_is_uniform_and_step_decorrelated():
    from lako_tpu.train.optim8 import _dither

    d0 = np.asarray(_dither((64, 256), 5, 1)).ravel()
    d1 = np.asarray(_dither((64, 256), 6, 1)).ravel()
    assert 0.0 <= d0.min() and d0.max() < 1.0
    assert abs(d0.mean() - 0.5) < 0.01
    # adjacent steps decorrelated; different salts too
    assert abs(np.corrcoef(d0, d1)[0, 1]) < 0.02
    d2 = np.asarray(_dither((64, 256), 5, 2)).ravel()
    assert abs(np.corrcoef(d0, d2)[0, 1]) < 0.02


def test_ema_tracks_under_quantization():
    """Constant gradient: v must converge near g^2 (=1e-4 of blockmax-ish
    scale) instead of freezing at its first lattice point."""
    tx = scale_by_adam_8bit(correct_bias=False)
    g = jnp.full((512,), 0.01)
    params = jnp.zeros((512,))
    state = tx.init(params)
    up = jax.jit(tx.update)
    for _ in range(600):
        u, state = up(g, state)
    # params is a single array, so state.mu/state.nu are bare Moment8s;
    # the exact f32 EMA after n steps is (1 - b^n) * target
    n, b1, b2 = 600, 0.9, 0.999
    v = np.asarray(_dequant(state.nu)).ravel()[:512]
    np.testing.assert_allclose(v.mean(), (1 - b2 ** n) * 1e-4, rtol=0.1)
    m = np.asarray(_dequant(state.mu)).ravel()[:512]
    np.testing.assert_allclose(m.mean(), (1 - b1 ** n) * 0.01, rtol=0.1)
    u = np.asarray(u).ravel()[:512]
    exp_u = (1 - b1 ** n) * 0.01 / (np.sqrt((1 - b2 ** n) * 1e-4) + 1e-6)
    np.testing.assert_allclose(u.mean(), exp_u, rtol=0.15)


def test_heterogeneous_block_small_elements_survive():
    """A 1.0-gradient element shares its block with 0.001-gradient ones.
    Nearest rounding freezes the small m at 0 (below half a lattice step of
    the blockmax scale) so those coordinates never move; stochastic
    rounding keeps their TIME-AVERAGED Adam update near the correct
    m/sqrt(v) ~= 1 — the justification for stochastic_round=True."""
    g = jnp.full((256,), 0.001).at[0].set(1.0)

    def drive(sr):
        # correct_bias so the converged f32 update is exactly g/|g| = 1
        # (uncorrected EMAs are only (1-b^n) converged at n=800)
        tx = scale_by_adam_8bit(correct_bias=True, stochastic_round=sr,
                                eps=1e-8)
        state = tx.init(jnp.zeros((256,)))
        up = jax.jit(tx.update)
        us = []
        for _ in range(800):
            u, state = up(g, state)
            us.append(np.asarray(u))
        return state, np.stack(us)

    state, us = drive(sr=False)
    m = np.asarray(_dequant(state.mu)).ravel()
    assert m[0] > 0.9                 # the big element is fine
    assert (m[1:256] == 0).all()      # the small ones froze
    assert abs(us[-200:, 5].mean()) < 0.2   # ...and never update

    state, us = drive(sr=True)
    # big element: exact fixed point; small elements: correct on time-average
    np.testing.assert_allclose(us[-200:, 0].mean(), 1.0, rtol=0.1)
    np.testing.assert_allclose(us[-200:, 1:256].mean(), 1.0, rtol=0.35)


def _tiny_problem(seed=0):
    rng = np.random.default_rng(seed)
    W_true = rng.normal(size=(16, 4)).astype(np.float32)
    X = rng.normal(size=(256, 16)).astype(np.float32)
    Y = X @ W_true
    params = {"w": jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)
                               * 0.1),
              "b": jnp.zeros((4,))}

    def loss_fn(p):
        pred = jnp.asarray(X) @ p["w"] + p["b"]
        return jnp.mean((pred - jnp.asarray(Y)) ** 2)

    return params, loss_fn


@pytest.mark.parametrize("correct_bias", [False, True])
def test_trajectory_tracks_f32_adam(correct_bias):
    params, loss_fn = _tiny_problem()

    def train(tx, n=600):
        p = params
        state = tx.init(p)

        @jax.jit
        def step(p, s):
            loss, g = jax.value_and_grad(loss_fn)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        first = None
        for _ in range(n):
            p, state, loss = step(p, state)
            first = float(loss) if first is None else first
        return first, float(loss)

    # decaying lr anneals the stochastic-rounding noise floor, as in any
    # real schedule (constant lr leaves an SR-noise plateau ~ lr)
    lr = optax.scale_by_schedule(lambda s: -1e-2 * (0.995 ** s))
    f8, l8 = train(optax.chain(
        scale_by_adam_8bit(correct_bias=correct_bias), lr))
    _, l32 = train(optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-6)
        if correct_bias else
        _raw_adam(), lr))
    # measured: l8/l32 ~ 0.97-1.0 in both modes — the quantized optimizer
    # tracks its f32 twin; the absolute level is set by the schedule
    assert l8 < 0.05 * f8, (l8, f8)            # it actually trains
    assert l8 < 1.5 * l32 + 1e-4, (l8, l32)    # and tracks f32 tightly


def _raw_adam():
    from lako_tpu.train.optim import _scale_by_adam

    return _scale_by_adam(False, 0.9, 0.999, 1e-6)


def test_state_is_4x_smaller():
    params = {"a": jnp.zeros((1000, 256)), "b": jnp.zeros((300,))}
    q8, f32 = moment_state_bytes(params)
    assert q8 * 3.8 < f32
    # and the real state matches the arithmetic
    tx = scale_by_adam_8bit()
    state = tx.init(params)
    real = sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves((state.mu, state.nu)))
    assert real == q8


def test_make_optimizer_routes_adamw8bit():
    params, loss_fn = _tiny_problem()
    tx = make_optimizer(OptimConfig(optim="adamw8bit", lr=1e-2,
                                    weight_decay=0.01, scheduler="linear",
                                    warmup_steps=5, total_steps=300))
    p = params
    state = tx.init(p)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    losses = []
    for _ in range(300):
        p, state, loss = step(p, state)
        losses.append(float(loss))
    assert losses[-1] < 0.1 * losses[0]


def test_adamw8bit_composes_with_pipeline_parallelism():
    """adamw8bit under the PP layout: the blocked int8 moments of the
    pipe-sharded stacks train to a falling loss and their state stays
    sharded (not silently gathered to every device)."""
    from tests.test_pp_train import _pipe_mesh, _setup
    from lako_tpu.parallel.pp_train import (make_pp_train_step,
                                            place_pp_params,
                                            pp_params_from_fid)
    from lako_tpu.train.state import TrainState

    cfg, model, params, ids, mask, labels = _setup()
    mesh = _pipe_mesh(pipe=2, data=2)
    pp = place_pp_params(mesh, pp_params_from_fid(params, cfg, 2))
    tx = make_optimizer(OptimConfig(optim="adamw8bit", lr=1e-3,
                                    total_steps=100, warmup_steps=0))
    state = TrainState.create(pp, tx)
    step = make_pp_train_step(mesh, cfg, n_microbatches=2, data_axis="data")
    losses = []
    for _ in range(4):
        state, loss = step(state, ids, mask, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    int8s = [x for x in jax.tree_util.tree_leaves(state.opt_state)
             if hasattr(x, "dtype") and x.dtype in (jnp.int8, jnp.uint8)]
    assert int8s, "8-bit moments missing from the PP optimizer state"
    # at least the large block-stack moments must not be fully replicated
    big = max(int8s, key=lambda x: x.size)
    shard_bytes = max(s.data.size for s in big.addressable_shards)
    assert shard_bytes < big.size, "8-bit PP moment state got replicated"


def test_reader_trains_with_adamw8bit():
    """End to end: ReaderTrainConfig(optim='adamw8bit') through train_reader
    — the state also flows through checkpoint serialization shapes."""
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
        "use_remat": False, "dtype": "float32",
        "data": {"n_context": 1, "text_maxlength": 16, "answer_maxlength": 4,
                 "stream": 2},
        "optim": {"optim": "adamw8bit", "lr": 3e-3},
        "checkpoint_dir": "/tmp/unused", "name": "opt8"})
    res = train_reader(cfg, exs, exs[:8], tok, save_checkpoints=False)
    losses = [h["loss"] for h in res.history]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
