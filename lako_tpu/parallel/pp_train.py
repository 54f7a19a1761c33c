"""Trainable full-model pipeline parallelism for the FiD reader.

Round-2's PP was an encoder-blocks demo; this module stages the ENTIRE
FiDT5 training computation — encoder stack, decoder stack (self + cross
attention), LM head and cross-entropy loss — over a ``pipe`` mesh axis, so
the t5-3b/11b presets (core/config.py) have a real training path when one
chip's HBM cannot hold the layer stack. The reference has no pipeline
parallelism at all (SURVEY.md §2.7: DDP only); this is beyond-reference
capability, built the TPU way:

- **Both stacks pipelined in one jitted step.** Stage ``s`` holds encoder
  layers ``[s·Le/S, (s+1)·Le/S)`` AND decoder layers ``[s·Ld/S, (s+1)·Ld/S)``
  — every device owns 1/S of the block weights (and of their optimizer
  state), placed with a single ``P('pipe')`` pytree spec. The step runs two
  GPipe passes (``pipeline_stages``): microbatched encoder, then
  microbatched decoder.
- **Encoder states are indexed, not shipped.** Every decoder layer
  cross-attends the full encoder output, which is the classic enc-dec PP
  headache. The encoder pipeline's output is already pipe-replicated (its
  masked psum), so each decoder stage just dynamic-indexes the (mB, N·L, H)
  block of the microbatch it is currently processing — zero ICI traffic for
  the largest activation in the model.
- **Loss under the pipeline, grads through it.** CE over all M microbatches'
  logits in one global mean (exact: a per-microbatch mean would mis-weight
  ragged -100 masks); ``jax.grad`` differentiates through both shard_maps —
  ppermute transposes reverse the permute, so the backward pass pipelines in
  the opposite direction and microbatch gradients accumulate inside the
  schedule. ``remat=True`` checkpoints each (tick, stage) body.
- **Small shared params are replicated** (embedding, relpos tables, final
  layer norms, untied lm_head): their per-device optimizer math is identical
  everywhere, exactly like DP, and they are a few percent of a big model.

Composes with DP (``data`` mesh axis: microbatch rows sharded) — the
dryrun drives pipe=2 x data=4. Dropout is not applied under PP (large-model
finetuning runs the 3b/11b presets with dropout 0; use the scan/flax
backends when dropout matters at small scale).

Parity: loss and grads equal the single-device ``FiDT5.apply`` to float
tolerance — pinned in tests/test_pp_train.py, which also checks the 1/S
parameter bytes per device. Reference training semantics being pipelined:
the reshape-trick FiD forward + CE of src/model.py:227-234 /
train_reader.py:37-120.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.layers import causal_bias, mask_to_bias
from lako_tpu.models.t5.model import shift_right
from lako_tpu.models.t5.scan_model import (StackedDecoderBlocks, _attend,
                                           _mlp_tail, _relpos_bias,
                                           stack_decoder_blocks)
from lako_tpu.parallel.pipeline import (StackedEncoderBlocks, _rms,
                                        _stage_apply, pipeline_stages,
                                        stack_encoder_blocks)

Array = jax.Array


class PPParams(NamedTuple):
    """Pipeline-ready FiDT5 parameters.

    ``enc``/``dec`` leaves carry leading (S, layers_per_stage, ...) axes and
    are sharded ``P('pipe')``; ``shared`` holds the replicated non-block
    parameters (embedding, relpos tables, final layer norms, optional
    lm_head kernel). This is the TRAIN-STATE layout under PP — optimizer
    state mirrors it, so params+opt bytes scale 1/S per device.
    """

    enc: StackedEncoderBlocks
    dec: StackedDecoderBlocks
    shared: Dict[str, Array]


def pp_params_from_fid(params, cfg: T5Config, n_stages: int) -> PPParams:
    """Canonical FiDT5 param tree → PPParams (no dtype cast: these are the
    master weights)."""
    if cfg.num_decoder_layers % n_stages:
        raise ValueError(
            f"num_decoder_layers={cfg.num_decoder_layers} not divisible by "
            f"{n_stages} stages")
    dt = params["t5"]["shared"]["embedding"].dtype
    enc = stack_encoder_blocks(params, cfg, n_stages=n_stages, dtype=dt)
    sd = stack_decoder_blocks(params, cfg, dtype=dt)
    lps = cfg.num_decoder_layers // n_stages
    dec = jax.tree_util.tree_map(
        lambda a: a.reshape(n_stages, lps, *a.shape[1:]), sd)
    shared = {
        "embedding": params["t5"]["shared"]["embedding"],
        "enc_relpos": params["t5"]["encoder"]["relpos"]["rel_embedding"],
        "dec_relpos": params["t5"]["decoder"]["relpos"]["rel_embedding"],
        "enc_final_ln": params["t5"]["encoder"]["final_ln"]["weight"],
        "dec_final_ln": params["t5"]["decoder"]["final_ln"]["weight"],
    }
    if not cfg.tie_word_embeddings:
        shared["lm_head"] = params["t5"]["lm_head"]["kernel"]
    return PPParams(enc=enc, dec=dec, shared=shared)


def fid_params_from_pp(pp: PPParams, cfg: T5Config):
    """PPParams → canonical FiDT5 param tree (checkpoint interop + the eval
    decode path, which runs on the standard tree)."""
    S = pp.enc.wq.shape[0]

    def unstack(a):
        return a.reshape(a.shape[0] * a.shape[1], *a.shape[2:])

    enc_names = [
        ("ln_attn", None, pp.enc.ln_attn),
        ("self_attn", "q", pp.enc.wq),
        ("self_attn", "k", pp.enc.wk),
        ("self_attn", "v", pp.enc.wv),
        ("self_attn", "o", pp.enc.wo),
        ("ln_mlp", None, pp.enc.ln_mlp),
        ("mlp", "wi", pp.enc.wi),
        ("mlp", "wi_0", pp.enc.wi_0),
        ("mlp", "wi_1", pp.enc.wi_1),
        ("mlp", "wo", pp.enc.wo_mlp),
    ]
    dec_names = [
        ("ln_self", None, pp.dec.ln_self),
        ("self_attn", "q", pp.dec.sq),
        ("self_attn", "k", pp.dec.sk),
        ("self_attn", "v", pp.dec.sv),
        ("self_attn", "o", pp.dec.so),
        ("ln_cross", None, pp.dec.ln_cross),
        ("cross_attn", "q", pp.dec.cq),
        ("cross_attn", "k", pp.dec.ck),
        ("cross_attn", "v", pp.dec.cv),
        ("cross_attn", "o", pp.dec.co),
        ("ln_mlp", None, pp.dec.ln_mlp),
        ("mlp", "wi", pp.dec.wi),
        ("mlp", "wi_0", pp.dec.wi_0),
        ("mlp", "wi_1", pp.dec.wi_1),
        ("mlp", "wo", pp.dec.wo_mlp),
    ]

    def blocks(names, n_layers):
        # unstack each leaf ONCE (this runs per eval epoch under PP; a
        # per-layer unstack would issue O(layers x leaves) reshapes on
        # pipe-sharded arrays)
        flat = [(group, sub, None if stacked is None else unstack(stacked))
                for group, sub, stacked in names]
        out: Dict[str, Any] = {}
        for i in range(n_layers):
            blk: Dict[str, Any] = {}
            for group, sub, u in flat:
                if u is None:
                    continue
                leaf = u[i]
                if sub is None:
                    blk[group] = {"weight": leaf}
                else:
                    d = blk.setdefault(group, {})
                    d[sub] = {"kernel": leaf}
            out[f"block_{i}"] = blk
        return out

    encoder = blocks(enc_names, cfg.num_layers)
    encoder["relpos"] = {"rel_embedding": pp.shared["enc_relpos"]}
    encoder["final_ln"] = {"weight": pp.shared["enc_final_ln"]}
    decoder = blocks(dec_names, cfg.num_decoder_layers)
    decoder["relpos"] = {"rel_embedding": pp.shared["dec_relpos"]}
    decoder["final_ln"] = {"weight": pp.shared["dec_final_ln"]}
    t5: Dict[str, Any] = {
        "shared": {"embedding": pp.shared["embedding"]},
        "encoder": encoder,
        "decoder": decoder,
    }
    if "lm_head" in pp.shared:
        t5["lm_head"] = {"kernel": pp.shared["lm_head"]}
    return {"t5": t5}


def pp_param_shardings(mesh: Mesh, pp: PPParams, pipe_axis: str = "pipe"):
    """NamedSharding tree: block stacks on ``pipe`` (1/S per device), shared
    params replicated."""
    staged = NamedSharding(mesh, P(pipe_axis))
    rep = NamedSharding(mesh, P())
    return PPParams(
        enc=jax.tree_util.tree_map(lambda _: staged, pp.enc),
        dec=jax.tree_util.tree_map(lambda _: staged, pp.dec),
        shared=jax.tree_util.tree_map(lambda _: rep, pp.shared),
    )


def place_pp_params(mesh: Mesh, pp: PPParams,
                    pipe_axis: str = "pipe") -> PPParams:
    # device_put of a committed jax Array to a replicated sharding can
    # zero-copy-alias the source buffer (one shard shares it); a later
    # donated train step would then delete the caller's original leaf.
    # Copy those first. Host numpy leaves cannot alias device buffers —
    # device_put them directly (no transient full-leaf device copy).
    def _place(a, s):
        if isinstance(a, jax.Array):
            a = jnp.array(a, copy=True)
        return jax.device_put(a, s)

    return jax.tree_util.tree_map(
        _place, pp, pp_param_shardings(mesh, pp, pipe_axis))


def _dec_stage_apply(cfg: T5Config, dtype, stage: StackedDecoderBlocks,
                     x: Array, enc: Array, cross_bias: Array,
                     self_bias: Array) -> Array:
    """Apply this stage's decoder layers: self-attn (causal, full-sequence
    teacher forcing) + cross-attn against the microbatch's encoder states +
    MLP — the training forward of models/t5/layers.py:T5DecoderBlock."""
    lps = stage.sq.shape[0]
    for i in range(lps):
        blk = StackedDecoderBlocks(*(None if z is None else z[i]
                                     for z in stage))
        xn = _rms(x, blk.ln_self, cfg.layer_norm_epsilon, dtype)
        x = x + _attend(xn, xn, blk.sq, blk.sk, blk.sv, blk.so,
                        self_bias, cfg, dtype)
        xn = _rms(x, blk.ln_cross, cfg.layer_norm_epsilon, dtype)
        x = x + _attend(xn, enc, blk.cq, blk.ck, blk.cv, blk.co,
                        cross_bias, cfg, dtype)
        x = _mlp_tail(x, blk.ln_mlp, blk.wi, blk.wi_0, blk.wi_1,
                      blk.wo_mlp, cfg, dtype, lambda t: t)
    return x


def make_pp_loss_fn(mesh: Mesh, cfg: T5Config, n_microbatches: int,
                    dtype=jnp.float32, remat: bool = True,
                    pipe_axis: str = "pipe",
                    data_axis: Optional[str] = None):
    """Build ``loss_fn(pp_params, input_ids, mask, labels) → (loss, logits)``
    running the full FiD training forward under the pipeline. Numerically
    equal (float tolerance) to ``FiDT5.apply`` with dropout off."""
    M = n_microbatches

    def enc_stage(stage, x, key_bias, relpos_bias):
        bias = key_bias.astype(jnp.float32) + relpos_bias
        return _stage_apply(cfg, dtype, stage, x, bias)

    def dec_stage(stage, x, aux, self_bias):
        enc_m, cross_bias_m = aux
        return _dec_stage_apply(cfg, dtype, stage, x, enc_m, cross_bias_m,
                                self_bias)

    def loss_fn(pp: PPParams, input_ids, mask, labels):
        B, N, L = input_ids.shape
        if B % M:
            raise ValueError(f"batch {B} not divisible by {M} microbatches")
        mB = B // M
        T = labels.shape[1]
        emb = jnp.asarray(pp.shared["embedding"], dtype=dtype)

        # ---- encoder pipeline over (M, mB*N, L, H) microbatches
        flat_ids = input_ids.reshape(B * N, L)
        x = jnp.take(emb, flat_ids, axis=0)
        key_bias = mask_to_bias(mask.reshape(B * N, L))      # (B*N,1,1,L)
        enc_relpos = _relpos_bias(pp.shared["enc_relpos"], L, L, True, cfg)
        enc_out = pipeline_stages(
            mesh, enc_stage, pp.enc,
            x.reshape(M, mB * N, L, -1),
            key_bias.reshape(M, mB * N, 1, 1, L),
            const=enc_relpos, pipe_axis=pipe_axis, data_axis=data_axis,
            remat=remat)
        enc_out = _rms(enc_out.reshape(B * N, L, -1),
                       jnp.asarray(pp.shared["enc_final_ln"], jnp.float32),
                       cfg.layer_norm_epsilon, dtype)
        enc = enc_out.reshape(B, N * L, -1)                  # FiD reshape
        enc_mask = mask.reshape(B, N * L)

        # ---- decoder pipeline over (M, mB, T, H); encoder states indexed
        dec_in = shift_right(labels, cfg.decoder_start_token_id,
                             cfg.pad_token_id)
        y = jnp.take(emb, dec_in, axis=0)
        self_bias = _relpos_bias(pp.shared["dec_relpos"], T, T, False,
                                 cfg) + causal_bias(T, T)
        cross_bias = mask_to_bias(enc_mask)                  # (B,1,1,N*L)
        dec_out = pipeline_stages(
            mesh, dec_stage, pp.dec,
            y.reshape(M, mB, T, -1),
            (enc.reshape(M, mB, N * L, -1),
             cross_bias.reshape(M, mB, 1, 1, N * L)),
            const=self_bias, pipe_axis=pipe_axis, data_axis=data_axis,
            remat=remat)

        xh = _rms(dec_out.reshape(B, T, -1),
                  jnp.asarray(pp.shared["dec_final_ln"], jnp.float32),
                  cfg.layer_norm_epsilon, dtype)
        if cfg.tie_word_embeddings:
            xh = xh * (cfg.d_model ** -0.5)
            logits = xh @ emb.T
        else:
            logits = xh @ jnp.asarray(pp.shared["lm_head"], dtype=dtype)

        # global token mean across ALL microbatches (a per-microbatch mean
        # would mis-weight ragged -100 masks)
        valid = labels != -100
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = -(tll * valid).sum() / jnp.maximum(valid.sum(), 1)
        return loss, logits

    return loss_fn


def make_pp_train_step(mesh: Mesh, cfg: T5Config, n_microbatches: int,
                       dtype=jnp.float32, remat: bool = True,
                       pipe_axis: str = "pipe",
                       data_axis: Optional[str] = None,
                       schedule: str = "gpipe"):
    """Jitted ``(state, ids, mask, labels) → (state, loss)`` over PPParams.
    ``state`` is a TrainState whose params/opt-state live in the PP layout
    (use ``place_pp_params`` + ``TrainState.create``).

    ``schedule="gpipe"`` autodiffs through the fwd-all-then-bwd-all
    pipeline (activation memory O(M)); ``"1f1b"`` uses the interleaved
    wavefront of parallel/pp_1f1b.py (O(S) activations, same grads)."""
    import functools

    if schedule not in ("gpipe", "1f1b"):
        raise ValueError(f"pp schedule must be gpipe|1f1b, got {schedule!r}")
    if schedule == "1f1b":
        if not remat:
            from lako_tpu.core.logging import get_logger

            get_logger().warning(
                "pp_schedule='1f1b' ignores remat=False: per-stage "
                "recompute is built into the wavefront backward")
        from lako_tpu.parallel.pp_1f1b import make_pp_1f1b_loss_and_grads

        lg = make_pp_1f1b_loss_and_grads(mesh, cfg, n_microbatches,
                                         dtype=dtype, pipe_axis=pipe_axis,
                                         data_axis=data_axis)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step_1f1b(state, ids, mask, labels):
            loss, grads = lg(state.params, ids, mask, labels)
            return state.apply_gradients(grads), loss

        return train_step_1f1b

    loss_fn = make_pp_loss_fn(mesh, cfg, n_microbatches, dtype=dtype,
                              remat=remat, pipe_axis=pipe_axis,
                              data_axis=data_axis)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, ids, mask, labels):
        def lf(p):
            loss, _ = loss_fn(p, ids, mask, labels)
            return loss

        loss, grads = jax.value_and_grad(lf)(state.params)
        return state.apply_gradients(grads), loss

    return train_step
