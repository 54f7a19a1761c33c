"""Pipeline parallelism: GPipe schedule equals sequential application."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.layers import RelativePositionBias
from lako_tpu.models.t5.model import FiDT5, mask_to_bias
from lako_tpu.parallel.pipeline import (pipeline_encoder_blocks,
                                        sequential_encoder_blocks,
                                        shard_stacked_for_pipeline,
                                        stack_encoder_blocks)


def _setup(gated=False, seed=0, B=4, N=1, L=12):
    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=4,
                   num_decoder_layers=2, num_heads=4,
                   relative_attention_num_buckets=8, dropout_rate=0.0,
                   feed_forward_proj="gated-gelu" if gated else "relu")
    model = FiDT5(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(1, 64, size=(B, N, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, N, L)) < 0.9)
    params = model.init(jax.random.PRNGKey(seed), ids, mask,
                        jnp.zeros((B, 3), jnp.int32))["params"]
    embeds = jnp.take(jnp.asarray(params["t5"]["shared"]["embedding"]),
                      ids.reshape(B * N, L), axis=0)
    flat_mask = mask.reshape(B * N, L)
    relpos = RelativePositionBias(cfg, bidirectional=True,
                                  dtype=jnp.float32)
    bias = relpos.apply(
        {"params": params["t5"]["encoder"]["relpos"]}, L, L) \
        + mask_to_bias(flat_mask)                       # (B·N, h, L, L)
    return cfg, model, params, embeds, flat_mask, bias


@pytest.mark.parametrize("gated", [False, True])
def test_sequential_blocks_match_flax_encoder(gated):
    """The functional stacked-block apply reproduces the flax encoder
    (embeds → blocks; final_ln applied on top for the comparison)."""
    cfg, model, params, embeds, flat_mask, bias = _setup(gated)
    stacked = stack_encoder_blocks(params, cfg, n_stages=2)
    out = sequential_encoder_blocks(cfg, stacked, embeds, bias)
    # final_ln to match T5Encoder.__call__
    w = jnp.asarray(params["t5"]["encoder"]["final_ln"]["weight"])
    var = jnp.mean(jnp.square(out), axis=-1, keepdims=True)
    out = out * jax.lax.rsqrt(var + cfg.layer_norm_epsilon) * w

    from lako_tpu.models.t5.model import T5Encoder

    ref = T5Encoder(cfg, dtype=jnp.float32).apply(
        {"params": params["t5"]["encoder"]}, embeds, flat_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n_micro", [2, 4])
def test_pipeline_matches_sequential(n_micro):
    cfg, model, params, embeds, flat_mask, bias = _setup(B=8)
    stacked = stack_encoder_blocks(params, cfg, n_stages=2)
    ref = sequential_encoder_blocks(cfg, stacked, embeds, bias)

    devs = np.array(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devs, ("pipe",))
    stacked = shard_stacked_for_pipeline(mesh, stacked)
    rows = embeds.shape[0]
    mB = rows // n_micro
    mx = embeds.reshape(n_micro, mB, *embeds.shape[1:])
    mb = bias.reshape(n_micro, mB, *bias.shape[1:])
    out = pipeline_encoder_blocks(mesh, cfg, stacked, mx, mb)
    out = out.reshape(rows, *embeds.shape[1:])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_4stage_dp_grads():
    """pipe=4 x data=2 mesh: forward matches and grads flow through the
    schedule (ppermute transpose) with finite values equal to sequential."""
    cfg, model, params, embeds, flat_mask, bias = _setup(B=8)
    stacked = stack_encoder_blocks(params, cfg, n_stages=4)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("pipe", "data"))
    sharded = shard_stacked_for_pipeline(mesh, stacked)
    n_micro, mB = 2, 4
    mx = embeds.reshape(n_micro, mB, *embeds.shape[1:])
    mb = bias.reshape(n_micro, mB, *bias.shape[1:])

    def pipe_loss(st):
        out = pipeline_encoder_blocks(mesh, cfg, st, mx, mb,
                                      data_axis="data")
        return jnp.mean(jnp.square(out))

    def seq_loss(st):
        out = sequential_encoder_blocks(cfg, st, embeds, bias)
        return jnp.mean(jnp.square(out))

    lp, gp = jax.value_and_grad(pipe_loss)(sharded)
    ls, gs = jax.value_and_grad(seq_loss)(stacked)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_stage_params_are_placed_per_device():
    """Each pipe device holds 1/S of the stacked block weights."""
    cfg, model, params, embeds, flat_mask, bias = _setup()
    stacked = stack_encoder_blocks(params, cfg, n_stages=2)
    devs = np.array(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devs, ("pipe",))
    sharded = shard_stacked_for_pipeline(mesh, stacked)
    wq = sharded.wq                       # (2, lps, H, h*d)
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    assert shard_shapes == {(1, *wq.shape[1:])}
