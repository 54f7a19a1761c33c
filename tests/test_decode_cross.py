"""Fused decode cross-attention kernel vs the XLA dequantized reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lako_tpu.ops.decode_cross_attn import (fused_decode_cross_attention,
                                            xla_reference)


def _inputs(B=2, h=4, d=16, K=37, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, h, d)), jnp.float32)
    kf = rng.normal(size=(B, h, d, K)).astype(np.float32)
    vf = rng.normal(size=(B, h, d, K)).astype(np.float32)

    def quant(x):
        amax = np.abs(x).max(axis=-1, keepdims=True)
        scale = np.maximum(amax, 1e-8) / 127.0
        q_ = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
        return jnp.asarray(q_), jnp.asarray(scale.astype(np.float32))

    k_i8, k_s = quant(kf)
    v_i8, v_s = quant(vf)
    mask = rng.random((B, K)) < 0.85
    mask[:, 0] = True
    bias = jnp.asarray(np.where(mask, 0.0, -1e9)[:, None, :], jnp.float32)
    return q, k_i8, k_s, v_i8, v_s, bias


@pytest.mark.parametrize("K", [37, 128, 260])
def test_fused_matches_xla_reference(K):
    q, k_i8, k_s, v_i8, v_s, bias = _inputs(K=K)
    ref = xla_reference(q, k_i8, k_s, v_i8, v_s, bias)
    out = fused_decode_cross_attention(q, k_i8, k_s, v_i8, v_s, bias,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_scale_shapes():
    """Accepts both (B,h,d) and (B,h,d,1) scale layouts."""
    q, k_i8, k_s, v_i8, v_s, bias = _inputs()
    a = fused_decode_cross_attention(q, k_i8, k_s[..., 0], v_i8, v_s[..., 0],
                                     bias, interpret=True)
    b = fused_decode_cross_attention(q, k_i8, k_s, v_i8, v_s, bias,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_respects_mask():
    """Masked keys get zero attention: flipping their V must not change out."""
    q, k_i8, k_s, v_i8, v_s, bias = _inputs(seed=3)
    out1 = fused_decode_cross_attention(q, k_i8, k_s, v_i8, v_s, bias,
                                        interpret=True)
    masked = np.asarray(bias[:, 0, :]) < -1e8          # (B, K)
    v_mod = np.asarray(v_i8).copy()
    v_mod[np.broadcast_to(masked[:, None, None, :], v_mod.shape)] = 77
    out2 = fused_decode_cross_attention(q, jnp.asarray(np.asarray(k_i8)),
                                        k_s, jnp.asarray(v_mod), v_s, bias,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


def test_engine_fused_cross_matches_unfused():
    """DecodeEngine(fused_cross=True) produces the same greedy tokens as the
    plain int8-KV engine (both quantize identically; the kernel only changes
    where the dequant arithmetic happens)."""
    from lako_tpu.core.config import T5Config
    from lako_tpu.models.t5.engine import DecodeEngine
    from lako_tpu.models.t5.model import FiDT5

    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_decoder_layers=3, num_heads=4,
                   relative_attention_num_buckets=8, dropout_rate=0.0)
    model = FiDT5(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    ids = jnp.asarray(rng.integers(1, 64, size=(3, 2, 10)), jnp.int32)
    mask = jnp.asarray(rng.random((3, 2, 10)) < 0.9)
    params = model.init(jax.random.PRNGKey(9), ids, mask,
                        jnp.zeros((3, 4), jnp.int32))["params"]
    base = DecodeEngine(model, max_length=8, kv_dtype="int8",
                        collect_cross_scores=True)
    t0, x0 = base.generate(params, ids, mask)
    fused = DecodeEngine(model, max_length=8, kv_dtype="int8",
                         fused_cross=True, collect_cross_scores=True)
    t1, x1 = fused.generate(params, ids, mask)
    # first step (collect) falls back to the einsum path in both engines, so
    # the captured cross logits must be identical; tokens must agree
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                               rtol=1e-4, atol=1e-4)
    agree = (np.asarray(t0) == np.asarray(t1)).mean()
    assert agree >= 0.9, agree
