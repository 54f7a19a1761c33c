"""K-streamed flash attention numerics (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lako_tpu.ops.flash_streamed import _xla_reference, streamed_attention


def _inputs(B=2, H=4, L=160, Lk=160, D=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)), dtype)
    rel = jnp.asarray(rng.normal(size=(H, L, Lk)), jnp.float32)
    mask = jnp.asarray(rng.random((B, Lk)) < 0.9)
    # ensure no fully-masked row weirdness
    mask = mask.at[:, 0].set(True)
    return q, k, v, rel, mask


@pytest.mark.parametrize("shape", [
    dict(L=160, Lk=160),        # unaligned → padding paths
    dict(L=256, Lk=512),        # multi-k-block streaming
    dict(L=384, Lk=640),        # q and k blocks both > 1
])
def test_streamed_matches_xla(shape):
    q, k, v, rel, mask = _inputs(**shape)
    ref = _xla_reference(q, k, v, rel, mask)
    out = streamed_attention(q, k, v, rel, mask, 256, 256, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_streamed_gradients_match_xla():
    q, k, v, rel, mask = _inputs(L=128, Lk=256, H=2, D=16)

    def loss_stream(q, k, v, rel):
        return jnp.sum(streamed_attention(q, k, v, rel, mask, 128, 128, True)
                       ** 2)

    def loss_ref(q, k, v, rel):
        return jnp.sum(_xla_reference(q, k, v, rel, mask) ** 2)

    gs = jax.grad(loss_stream, argnums=(0, 1, 2, 3))(q, k, v, rel)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_streamed_bf16():
    q, k, v, rel, mask = _inputs(L=256, Lk=256, dtype=jnp.bfloat16)
    ref = _xla_reference(q, k, v, rel, mask)
    out = streamed_attention(q, k, v, rel, mask, 128, 128, True)
    # bf16 + online-softmax reassociation: bound mean and worst-case error
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.mean() < 5e-3, err.mean()
    assert err.max() < 0.15, err.max()


def test_encoder_integration_streamed_matches_standard(monkeypatch):
    """T5Encoder routes through the streamed kernel when use_flash_attention
    and L >= flash_min_length; outputs match the standard XLA path."""
    from lako_tpu.core.config import T5Config
    from lako_tpu.models.t5.model import T5Encoder

    monkeypatch.setenv("LAKO_FLASH_INTERPRET", "1")
    rng = np.random.default_rng(5)
    L = 160
    base = dict(vocab_size=32, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                num_decoder_layers=2, num_heads=4,
                relative_attention_num_buckets=8, dropout_rate=0.0)
    cfg_on = T5Config(**base, use_flash_attention=True, flash_min_length=128)
    cfg_off = T5Config(**base)

    embeds = jnp.asarray(rng.normal(size=(2, L, 32)), jnp.float32)
    mask = jnp.asarray(rng.random((2, L)) < 0.9).at[:, 0].set(True)

    enc_on = T5Encoder(cfg_on, dtype=jnp.float32)
    enc_off = T5Encoder(cfg_off, dtype=jnp.float32)
    params = enc_off.init(jax.random.PRNGKey(0), embeds, mask)["params"]
    ref = enc_off.apply({"params": params}, embeds, mask)
    out = enc_on.apply({"params": params}, embeds, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # below the crossover the standard path is used even when enabled
    short = embeds[:, :64], mask[:, :64]
    ref_s = enc_off.apply({"params": params}, *short)
    out_s = enc_on.apply({"params": params}, *short)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s),
                               rtol=1e-6, atol=1e-6)


def test_streamed_gradients_unaligned_multiblock():
    """Streamed backward (3-pass, no O(L²) materialization): padding rows,
    multi q/k blocks, and the batch-reduced drel must all match XLA."""
    q, k, v, rel, mask = _inputs(L=300, Lk=330, B=3, H=2, D=16)

    def loss_stream(q, k, v, rel):
        return jnp.sum(streamed_attention(q, k, v, rel, mask, 128, 128, True)
                       ** 2)

    def loss_ref(q, k, v, rel):
        return jnp.sum(_xla_reference(q, k, v, rel, mask) ** 2)

    gs = jax.grad(loss_stream, argnums=(0, 1, 2, 3))(q, k, v, rel)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    assert len(gs) == len(gr) == 4
    for name, a, b in zip(["q", "k", "v", "rel"], gs, gr):
        a, b = np.asarray(a), np.asarray(b)
        if name == "rel":
            # drel sums exp/log-recomputed dS over the batch; its per-element
            # noise floor (identical between this kernel and a float64 oracle
            # for the XLA path) makes a hard elementwise rtol meaningless for
            # near-zero entries — bound by the gradient's own scale instead
            assert np.abs(a - b).max() <= 3e-3 * np.abs(b).max(), name
        else:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                       err_msg=name)
