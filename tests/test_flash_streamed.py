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
