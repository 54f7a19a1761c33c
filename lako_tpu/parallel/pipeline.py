"""GPipe-style pipeline parallelism over T5 encoder blocks (shard_map +
ppermute over a `pipe` mesh axis).

The reference has no pipeline parallelism (SURVEY.md §2.7 — its parallelism
is DDP only), and t5-large does not need it on a v5e; this module completes
the parallelism matrix for models whose layer stack exceeds one chip's HBM
(t5-3b/11b readers). TPU-native design notes:

- Encoder blocks are STACKED per stage: every leaf gets a leading
  (n_stages, layers_per_stage) axis and the stage axis is sharded over
  ``pipe`` with a single ``P('pipe')`` pytree-prefix spec — each device
  holds only its own stage's weights (the point of PP: parameter memory
  scales 1/S).
- Schedule: classic GPipe fill-and-drain over M microbatches in
  M + S - 1 ticks, written INSIDE one shard_map so XLA sees a single SPMD
  program: every stage runs the same stage_apply at every tick, activations
  (and their per-microbatch attention bias) hop stage→stage+1 via
  ``lax.ppermute`` on ICI, and the last stage's outputs are made replicated
  with a masked ``psum``. No host round-trips between ticks.
- Backward: ``jax.grad`` differentiates straight through — ppermute's
  transpose is the reverse permute, so the backward pass pipelines in the
  opposite direction automatically (GPipe's fwd-then-bwd schedule, not
  1F1B; fine for a demo, and the memory behavior is what remat is for).

Numerics: equivalent to applying the same blocks sequentially — pinned in
tests/test_pipeline_pp.py, which also checks grads and the 1/S parameter
placement. Driven multichip in __graft_entry__.dryrun_multichip (pipe=2 x
data=4 on the virtual mesh).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lako_tpu.core.config import T5Config

Array = jax.Array


class StackedEncoderBlocks(NamedTuple):
    """Encoder block weights with leading (n_stages, layers_per_stage) axes."""

    ln_attn: Array
    wq: Array
    wk: Array
    wv: Array
    wo: Array
    ln_mlp: Array
    wi: Optional[Array]
    wi_0: Optional[Array]
    wi_1: Optional[Array]
    wo_mlp: Array


def stack_encoder_blocks(params, cfg: T5Config, n_stages: int,
                         dtype=jnp.float32) -> StackedEncoderBlocks:
    """FiDT5/T5 param tree → per-stage stacked encoder block weights."""
    enc = params["t5"]["encoder"]
    L = cfg.num_layers
    if L % n_stages:
        raise ValueError(f"num_layers={L} not divisible by {n_stages} stages")
    lps = L // n_stages

    def stack(fn):
        a = jnp.stack([jnp.asarray(fn(enc[f"block_{i}"]), dtype=dtype)
                       for i in range(L)])
        return a.reshape(n_stages, lps, *a.shape[1:])

    gated = cfg.is_gated_act
    return StackedEncoderBlocks(
        ln_attn=stack(lambda b: b["ln_attn"]["weight"]),
        wq=stack(lambda b: b["self_attn"]["q"]["kernel"]),
        wk=stack(lambda b: b["self_attn"]["k"]["kernel"]),
        wv=stack(lambda b: b["self_attn"]["v"]["kernel"]),
        wo=stack(lambda b: b["self_attn"]["o"]["kernel"]),
        ln_mlp=stack(lambda b: b["ln_mlp"]["weight"]),
        wi=None if gated else stack(lambda b: b["mlp"]["wi"]["kernel"]),
        wi_0=stack(lambda b: b["mlp"]["wi_0"]["kernel"]) if gated else None,
        wi_1=stack(lambda b: b["mlp"]["wi_1"]["kernel"]) if gated else None,
        wo_mlp=stack(lambda b: b["mlp"]["wo"]["kernel"]),
    )


def _rms(x, w, eps, dtype):
    # weight cast to the compute dtype like layers.RMSNorm:36-37 — an f32
    # weight must not promote a bf16 stream (caught by the 3b bf16 test)
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(dtype) \
        * jnp.asarray(w, dtype)


def _apply_block(cfg: T5Config, dtype, x: Array, bias: Array, blk) -> Array:
    """One T5 encoder block (pre-LN, unscaled attention — T5 folds the scale
    into the init; matches models/t5/layers.py:T5EncoderBlock)."""
    h, d = cfg.num_heads, cfg.d_kv
    B, L, _ = x.shape
    (ln_a, wq, wk, wv, wo, ln_m, wi, wi0, wi1, wo_m) = blk

    xn = _rms(x, ln_a, cfg.layer_norm_epsilon, dtype)
    split = lambda t: t.reshape(B, L, h, d).transpose(0, 2, 1, 3)
    q, k, v = split(xn @ wq), split(xn @ wk), split(xn @ wv)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, h * d)
    x = x + ctx @ wo

    xn = _rms(x, ln_m, cfg.layer_norm_epsilon, dtype)
    if wi is not None:
        act = getattr(jax.nn, cfg.feed_forward_proj)(xn @ wi)
    else:
        gact = cfg.feed_forward_proj.removeprefix("gated-")
        act = getattr(jax.nn, gact)(xn @ wi0) * (xn @ wi1)
    return x + act @ wo_m


def _stage_apply(cfg: T5Config, dtype, stage, x: Array, bias: Array) -> Array:
    """Apply this stage's layers_per_stage blocks sequentially.
    stage leaves: (layers_per_stage, ...)."""
    lps = stage.wq.shape[0]
    for i in range(lps):
        blk = tuple(None if z is None else z[i] for z in stage)
        x = _apply_block(cfg, dtype, x, bias, blk)
    return x


def sequential_encoder_blocks(cfg: T5Config, stacked: StackedEncoderBlocks,
                              x: Array, bias: Array,
                              dtype=jnp.float32) -> Array:
    """Single-device reference: all stages in order (the pipeline's oracle)."""
    S = stacked.wq.shape[0]
    for s in range(S):
        stage = StackedEncoderBlocks(*(None if z is None else z[s]
                                       for z in stacked))
        x = _stage_apply(cfg, dtype, stage, x, bias)
    return x


def pipeline_stages(mesh: Mesh, stage_fn, stage_params, micro_x: Array,
                    micro_aux=None, const=None,
                    pipe_axis: str = "pipe",
                    data_axis: Optional[str] = None,
                    remat: bool = False) -> Array:
    """Generalized GPipe fill-and-drain: run M microbatches through S stages.

    - ``stage_params``: pytree whose leaves carry a leading (S, ...) stage
      axis, sharded ``P(pipe_axis)`` — each device holds 1/S of the weights.
    - ``micro_x``: (M, mB, ...) stage-0 inputs; dim 1 may be sharded over
      ``data_axis`` (DP x PP). Activations hop stage→stage+1 via
      ``lax.ppermute`` on ICI.
    - ``micro_aux``: pytree of per-microbatch side inputs with leading
      (M, mB, ...) axes, replicated over ``pipe``. Each stage
      dynamic-indexes the microbatch it is currently processing
      (``t - s``) LOCALLY — aux never ships over the interconnect (the
      round-2 design shipped the attention bias through ppermute; indexing
      replicated aux is free by comparison and generalizes to the decoder's
      cross-attended encoder states).
    - ``const``: pytree replicated everywhere, passed to every stage call
      (e.g. a shared relative-position bias).
    - ``stage_fn(stage_slice, x, aux_m, const) -> y`` with ``y`` shaped like
      ``x``. With ``remat=True`` the stage body is wrapped in
      ``jax.checkpoint`` so backward recomputes per (tick, stage) — GPipe's
      per-stage rematerialization.

    Returns (M, mB, ...) last-stage outputs, replicated over ``pipe``.
    Backward: ``jax.grad`` differentiates through — ppermute's transpose is
    the reverse permute, so gradients pipeline backwards automatically and
    microbatch gradients accumulate inside the schedule (the loss sums over
    the M axis outside).
    """
    from jax.experimental.shard_map import shard_map

    S = mesh.shape[pipe_axis]
    M = micro_x.shape[0]
    x_spec = P(None, data_axis)
    aux_spec = jax.tree_util.tree_map(lambda _: P(None, data_axis), micro_aux)
    body = jax.checkpoint(stage_fn) if remat else stage_fn

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(pipe_axis), x_spec, aux_spec,
                  jax.tree_util.tree_map(lambda _: P(), const)),
        out_specs=x_spec, check_rep=False)
    def run(stage_params, xs, aux, cst):
        stage = jax.tree_util.tree_map(lambda a: a[0], stage_params)
        s = jax.lax.axis_index(pipe_axis)
        perm = [(i, (i + 1) % S) for i in range(S)]
        outs = jnp.zeros_like(xs)
        carry = jnp.zeros_like(xs[0])
        for t in range(M + S - 1):        # static fill-and-drain schedule
            x_in = jnp.where(s == 0, xs[min(t, M - 1)], carry)
            # microbatch index this stage works on at tick t (clipped out of
            # window — the result is masked away)
            m = jnp.clip(t - s, 0, M - 1)
            aux_m = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, m, axis=0,
                                                       keepdims=False), aux)
            y = body(stage, x_in, aux_m, cst)
            w = t - (S - 1)
            if 0 <= w < M:
                outs = outs.at[w].set(jnp.where(s == S - 1, y, outs[w]))
            if t < M + S - 2:             # last tick has nothing left to send
                carry = jax.lax.ppermute(y, pipe_axis, perm)
        # only the last stage holds real outputs → masked psum replicates
        return jax.lax.psum(
            jnp.where(s == S - 1, outs, jnp.zeros_like(outs)), pipe_axis)

    return run(stage_params, micro_x, micro_aux, const)


def pipeline_encoder_blocks(mesh: Mesh, cfg: T5Config,
                            stacked: StackedEncoderBlocks,
                            micro_x: Array, micro_bias: Array,
                            pipe_axis: str = "pipe",
                            data_axis: Optional[str] = None,
                            dtype=jnp.float32) -> Array:
    """Run (M, mB, L, H) microbatches through the staged encoder blocks.

    micro_bias: (M, mB|1, heads|1, L, L) additive attention bias per
    microbatch (relpos + key mask) — it travels with its activation through
    the pipeline. With ``data_axis`` set, size-1 bias rows are broadcast to
    the full microbatch first (a size-1 axis cannot be sharded over the data
    axis — advisor r2). Returns (M, mB, L, H), replicated over the pipe axis.
    """
    from jax.experimental.shard_map import shard_map

    S = mesh.shape[pipe_axis]
    if data_axis is not None and micro_bias.shape[1] == 1 < micro_x.shape[1]:
        micro_bias = jnp.broadcast_to(
            micro_bias, micro_bias.shape[:1] + (micro_x.shape[1],)
            + micro_bias.shape[2:])
    dspec = data_axis  # None → replicated rows
    x_spec = P(None, dspec)
    b_spec = P(None, dspec)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(pipe_axis), x_spec, b_spec),
        out_specs=x_spec, check_rep=False)
    def run(stage_params, xs, biases):
        stage = jax.tree_util.tree_map(lambda a: a[0], stage_params)
        s = jax.lax.axis_index(pipe_axis)
        M = xs.shape[0]
        perm = [(i, (i + 1) % S) for i in range(S)]
        outs = jnp.zeros_like(xs)
        carry_x = jnp.zeros_like(xs[0])
        carry_b = jnp.zeros_like(biases[0])
        for t in range(M + S - 1):        # static fill-and-drain schedule
            idx = min(t, M - 1)
            x_in = jnp.where(s == 0, xs[idx], carry_x)
            b_in = jnp.where(s == 0, biases[idx], carry_b)
            y = _stage_apply(cfg, dtype, stage, x_in, b_in)
            w = t - (S - 1)
            if 0 <= w < M:
                outs = outs.at[w].set(jnp.where(s == S - 1, y, outs[w]))
            if t < M + S - 2:             # last tick has nothing left to send
                carry_x = jax.lax.ppermute(y, pipe_axis, perm)
                carry_b = jax.lax.ppermute(b_in, pipe_axis, perm)
        # only the last stage holds real outputs → masked psum replicates
        outs = jax.lax.psum(
            jnp.where(s == S - 1, outs, jnp.zeros_like(outs)), pipe_axis)
        return outs

    return run(stacked, micro_x, micro_bias)


def shard_stacked_for_pipeline(mesh: Mesh, stacked: StackedEncoderBlocks,
                               pipe_axis: str = "pipe"):
    """Place each stage's weights on its pipe-axis devices (1/S per device)."""
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(pipe_axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), stacked)
