"""Scan-over-layers training forward: parity with FiDT5 + O(1) program size."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.model import FiDT5
from lako_tpu.models.t5.scan_model import make_scan_loss_fn


def _setup(gated=False, n_layers=3, seed=0, B=3, N=2, L=10, T=5):
    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                   num_layers=n_layers, num_decoder_layers=n_layers,
                   num_heads=4, relative_attention_num_buckets=8,
                   dropout_rate=0.1,
                   feed_forward_proj="gated-gelu" if gated else "relu")
    model = FiDT5(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(1, 64, size=(B, N, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, N, L)) < 0.9)
    labels = jnp.asarray(rng.integers(1, 64, size=(B, T)), jnp.int32)
    labels = labels.at[:, -2:].set(-100)       # pad tail like real batches
    params = model.init(jax.random.PRNGKey(seed), ids, mask, labels)["params"]
    return cfg, model, params, ids, mask, labels


@pytest.mark.parametrize("gated", [False, True])
@pytest.mark.parametrize("remat", [False, True])
def test_scan_loss_matches_flax(gated, remat):
    cfg, model, params, ids, mask, labels = _setup(gated)
    ref_loss, ref_logits, _ = model.apply({"params": params}, ids, mask,
                                          labels)
    loss_fn = make_scan_loss_fn(cfg, remat=remat)
    loss, logits = loss_fn(params, ids, mask, labels)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_scan_grads_match_flax():
    cfg, model, params, ids, mask, labels = _setup()

    def flax_loss(p):
        loss, _, _ = model.apply({"params": p}, ids, mask, labels)
        return loss

    scan_fn = make_scan_loss_fn(cfg, remat=True)
    g_ref = jax.grad(flax_loss)(params)
    g_scan = jax.grad(lambda p: scan_fn(p, ids, mask, labels)[0])(params)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_ref),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g_scan),
                   key=lambda kv: str(kv[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5, err_msg=str(ka))


def test_scan_dropout_trains():
    """Dropout path: finite loss that differs from the deterministic one and
    varies with the rng (streams are scan-local, not the flax module's)."""
    cfg, model, params, ids, mask, labels = _setup()
    fn = make_scan_loss_fn(cfg)
    det, _ = fn(params, ids, mask, labels)
    d1, _ = fn(params, ids, mask, labels, dropout_rng=jax.random.PRNGKey(1))
    d2, _ = fn(params, ids, mask, labels, dropout_rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(d1)) and np.isfinite(float(d2))
    assert float(d1) != float(det) and float(d1) != float(d2)


def test_program_size_constant_in_depth():
    """The point of the scan: traced program size must not grow with depth
    (the unrolled flax model's does)."""
    sizes = {}
    for n in (2, 8):
        cfg, model, params, ids, mask, labels = _setup(n_layers=n)
        fn = make_scan_loss_fn(cfg, remat=False)
        jaxpr = jax.make_jaxpr(
            lambda p: fn(p, ids, mask, labels)[0])(params)
        sizes[n] = len(jaxpr.jaxpr.eqns)
    # stacking adds one concatenate per layer; the layer BODY is traced once.
    # allow small growth from the stacking ops, forbid per-layer body growth
    assert sizes[8] < sizes[2] + 150, sizes

    flax_sizes = {}
    for n in (2, 8):
        cfg, model, params, ids, mask, labels = _setup(n_layers=n)

        def fl(p):
            loss, _, _ = model.apply({"params": p}, ids, mask, labels)
            return loss

        flax_sizes[n] = len(jax.make_jaxpr(fl)(params).jaxpr.eqns)
    assert flax_sizes[8] > flax_sizes[2] * 2, flax_sizes  # unrolled grows


def test_scan_rejects_multiquery():
    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_decoder_layers=2, num_heads=4,
                   relative_attention_num_buckets=8,
                   multiquery_cross_attention=True)
    model = FiDT5(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 64, size=(2, 1, 8)), jnp.int32)
    mask = jnp.ones((2, 1, 8), bool)
    labels = jnp.ones((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, labels)["params"]
    fn = make_scan_loss_fn(cfg)
    with pytest.raises(ValueError):
        fn(params, ids, mask, labels)


def test_scan_train_step_loss_decreases():
    """train_backend='scan' through make_reader_train_step: a few steps of
    the jitted scan train step reduce the loss on a fixed batch."""
    from lako_tpu.core.config import OptimConfig
    from lako_tpu.train.optim import make_optimizer
    from lako_tpu.train.reader import make_reader_train_step
    from lako_tpu.train.state import TrainState

    cfg, model, params, ids, mask, labels = _setup()
    tx = make_optimizer(OptimConfig(optim="adamw", lr=3e-3, total_steps=20,
                                    warmup_steps=0, scheduler="fixed"))
    state = TrainState.create(params, tx)
    step = make_reader_train_step(model, backend="scan")
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(8):
        state, loss = step(state, ids, mask, labels, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_scan_dropout_site_count_matches_flax():
    """The scan backend must apply every flax dropout SITE (advisor r2,
    medium): embeddings + final hidden (enc & dec), and per layer: attention
    probs, attn out, mlp inner, mlp out (4 enc / 6 dec sites). Scan traces
    each body once, so trace-time _dropout calls = 4 + 4 + 6 = 14."""
    import lako_tpu.models.t5.scan_model as sm

    cfg, model, params, ids, mask, labels = _setup()
    calls = []
    orig = sm._dropout

    def counting(x, rate, rng):
        calls.append(x.shape)
        return orig(x, rate, rng)

    sm._dropout = counting
    try:
        fn = sm.make_scan_loss_fn(cfg)
        loss, _ = fn(params, ids, mask, labels,
                     dropout_rng=jax.random.PRNGKey(0))
    finally:
        sm._dropout = orig
    assert np.isfinite(float(loss))
    assert len(calls) == 14, calls
