"""Optimizer coverage: layerwise decay scaling and gradient accumulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from lako_tpu.core.config import OptimConfig
from lako_tpu.train.optim import _layerwise_scale, make_optimizer
from lako_tpu.train.state import TrainState


def test_layerwise_scale_exponent():
    """Layer i's update is scaled by decay ** (7 - i) (reference
    src/util.py:185-227 exponent kept for parity)."""
    tx = _layerwise_scale(0.5)
    params = {
        "layer_0": {"w": jnp.ones(2)},
        "layer_7": {"w": jnp.ones(2)},
        "layer_9": {"w": jnp.ones(2)},
        "other": {"w": jnp.ones(2)},
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params))
    assert float(updates["layer_0"]["w"][0]) == pytest.approx(0.5 ** 7)
    assert float(updates["layer_7"]["w"][0]) == pytest.approx(1.0)
    assert float(updates["layer_9"]["w"][0]) == pytest.approx(0.5 ** -2)
    assert float(updates["other"]["w"][0]) == pytest.approx(1.0)


def test_gradient_accumulation_equivalence():
    """k micro-steps with accumulation == 1 step on the averaged gradient."""
    cfg = OptimConfig(optim="adam", lr=1e-2, scheduler="fixed", clip=1e9)
    params = {"w": jnp.array([1.0, -2.0, 3.0])}
    g1 = {"w": jnp.array([0.1, 0.2, -0.3])}
    g2 = {"w": jnp.array([0.3, -0.2, 0.1])}
    g_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)

    acc = make_optimizer(cfg.replace(accumulation_steps=2))
    state = TrainState.create(params, acc)
    s1 = state.apply_gradients(g1)
    # micro-step 1 must not change params yet
    np.testing.assert_allclose(np.asarray(s1.params["w"]), np.asarray(params["w"]))
    s2 = s1.apply_gradients(g2)

    plain = make_optimizer(cfg)
    ref = TrainState.create(params, plain).apply_gradients(g_mean)
    np.testing.assert_allclose(np.asarray(s2.params["w"]),
                               np.asarray(ref.params["w"]), rtol=1e-6)


def test_fixed_scheduler():
    cfg = OptimConfig(optim="adam", lr=5e-3, scheduler="fixed")
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.ones(3)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
    # adam with constant grads -> update magnitude ~= lr
    assert abs(float(updates["w"][0])) == pytest.approx(5e-3, rel=0.2)


def test_adamw_matches_hf_no_bias_correction():
    """The adamw path replicates HF AdamW(correct_bias=False)
    (reference src/util.py:224): raw EMA moments, decoupled weight decay."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads_seq = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]
    lr, wd, b1, b2, eps = 1e-2, 0.1, 0.9, 0.999, 1e-6

    # torch reference: HF's AdamW(correct_bias=False) == torch AdamW with the
    # bias-correction terms removed; replicate it explicitly.
    wt = torch.tensor(w0.copy())
    m = torch.zeros_like(wt)
    v = torch.zeros_like(wt)
    for g_np in grads_seq:
        g = torch.tensor(g_np)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        wt = wt - lr * m / (v.sqrt() + eps)
        wt = wt - lr * wd * wt  # decoupled decay, HF order

    cfg = OptimConfig(optim="adamw", lr=lr, weight_decay=wd, clip=1e9,
                      scheduler="fixed", adam_b1=b1, adam_b2=b2, adam_eps=eps)
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0.copy())}
    state = tx.init(params)
    for g_np in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g_np)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), wt.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_layerwise_decay_scales_weight_decay_like_hf():
    """HF's layerwise_decay_optimizer sets group lr = lr*decay^depth and that
    group lr drives BOTH the Adam step and the decoupled weight decay
    (reference src/util.py:216-229). One optimizer step must therefore decay
    layer_{i} params by lr*decay^(7-i)*wd, not the global lr*wd."""
    import jax
    import jax.numpy as jnp

    from lako_tpu.core.config import OptimConfig

    lr, wd, decay = 0.01, 0.5, 0.5
    params = {"layer_0": {"w": {"kernel": jnp.ones((3, 3))}},
              "layer_7": {"w": {"kernel": jnp.ones((3, 3))}}}
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)  # isolate decay
    tx = make_optimizer(OptimConfig(optim="adamw", lr=lr, weight_decay=wd,
                                    scheduler="fixed", layerwise_decay=decay,
                                    total_steps=10))
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # zero grads → update is purely the decay term −lr_group·wd·p
    got0 = float(updates["layer_0"]["w"]["kernel"][0, 0])
    got7 = float(updates["layer_7"]["w"]["kernel"][0, 0])
    np.testing.assert_allclose(got0, -lr * (decay ** 7) * wd, rtol=1e-6)
    np.testing.assert_allclose(got7, -lr * (decay ** 0) * wd, rtol=1e-6)


def test_adafactor_trains_and_state_is_factored():
    """optim='adafactor': loss decreases and the optimizer state for a (r,c)
    kernel is O(r+c), not O(r*c) (the point: t5-3b+ on 16 GB chips)."""
    import jax
    import jax.numpy as jnp

    from lako_tpu.core.config import OptimConfig

    r, c = 256, 192
    params = {"w": {"kernel": jnp.zeros((r, c)) + 0.5}}
    tx = make_optimizer(OptimConfig(optim="adafactor", lr=0.05,
                                    scheduler="fixed", total_steps=50))
    state = tx.init(params)

    # factored state: no leaf carries a full (r, c) second moment
    big = [x for x in jax.tree_util.tree_leaves(state)
           if hasattr(x, "shape") and tuple(x.shape) == (r, c)]
    assert not big, [x.shape for x in big]

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"]["kernel"]))

    losses = []
    for _ in range(12):
        g = jax.grad(loss_fn)(params)
        updates, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        losses.append(float(loss_fn(params)))
    assert losses[-1] < losses[0] * 0.8, losses
