"""Pallas kernel parity tests (interpreter mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lako_tpu.ops.flash_attention import _xla_attention, fused_attention


@pytest.mark.parametrize("L,Lk", [(16, 16), (130, 130), (32, 130)])
def test_fused_attention_matches_xla(L, Lk):
    rng = np.random.default_rng(0)
    B, H, D = 2, 4, 32
    q = rng.normal(size=(B, H, L, D)).astype(np.float32)
    k = rng.normal(size=(B, H, Lk, D)).astype(np.float32)
    v = rng.normal(size=(B, H, Lk, D)).astype(np.float32)
    mask = rng.random((B, 1, 1, Lk)) > 0.2
    bias = np.where(mask, 0.0, -1e9).astype(np.float32)
    bias = np.broadcast_to(bias, (B, 1, L, Lk))

    ref = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         jnp.asarray(bias))
    out = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(bias), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_attention_grads_match_xla():
    rng = np.random.default_rng(1)
    B, H, L, D = 1, 2, 24, 16
    q = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, D)).astype(np.float32))
    bias = jnp.zeros((B, 1, L, L), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, bias) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
