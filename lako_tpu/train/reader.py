"""Reader training and evaluation loops.

Behavioral model: reference train_reader.py:37-169 — epoch loop with grad clip +
schedule-per-step, per-epoch greedy-decode evaluation scored by weighted EM,
best-dev checkpointing, early stopping on patience. TPU execution model: one
jitted SPMD train step (batch sharded over the mesh ``data`` axis, params
replicated), one jitted fixed-shape generate fn — no host↔device chatter inside
the epoch.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lako_tpu.core import preemption
from lako_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from lako_tpu.core.config import ReaderTrainConfig, t5_config_for_size
from lako_tpu.core.logging import get_logger
from lako_tpu.core.mesh import (batch_sharding, local_rows, make_mesh,
                                process_is_main, put_global, replicated,
                                shard_batch)
from lako_tpu.data import ReaderCollator, ReaderDataset, batch_iterator
from lako_tpu.models.t5 import FiDT5
from lako_tpu.models.t5.decode import make_best_generate_fn
from lako_tpu.text.metrics import ems
from lako_tpu.train.optim import make_optimizer
from lako_tpu.train.state import TrainState


def make_reader_train_step(model: FiDT5, backend: str = "flax") -> Callable:
    """Jitted (state, ids, mask, labels, rng) → (state, loss).

    backend: "flax" (layer-unrolled module) or "scan"
    (models/t5/scan_model.py — lax.scan over stacked layers + per-layer
    remat: O(1) compile scaling for deep readers, same loss).

    Process-cached by model identity + backend (core/program_cache.py): the
    full loop's iteration N reuses iteration 1's compiled step. NOTE: the
    jit cache also keys on TrainState.tx (a static pytree field), so the
    optimizer must come from the equally-cached make_optimizer for the hit
    to land.
    """
    from lako_tpu.core.program_cache import cached_program, dtype_key

    key = ("reader_train_step", model.config, dtype_key(model.dtype),
           model.use_remat, model.remat_policy, backend)
    return cached_program(
        key, lambda: _build_reader_train_step(model, backend))


def _build_reader_train_step(model: FiDT5, backend: str) -> Callable:
    if backend == "scan":
        from lako_tpu.models.t5.scan_model import make_scan_loss_fn

        scan_loss = make_scan_loss_fn(model.config, dtype=model.dtype)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan_train_step(state: TrainState, ids, mask, labels, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                loss, _ = scan_loss(params, ids, mask, labels,
                                    dropout_rng=rng)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        return scan_train_step
    if backend != "flax":
        raise ValueError(f"unknown train backend {backend!r}")

    # donate the incoming state: halves train-state HBM (old+new buffers
    # never coexist) — at t5-large this is the difference between batch 32
    # fitting or OOMing on a 16 GB chip
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, ids, mask, labels, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            loss, _, _ = model.apply(
                {"params": params}, ids, mask, labels,
                deterministic=False, rngs={"dropout": rng},
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)
        return state, loss

    return train_step


def evaluate_reader(
    generate_fn: Callable,
    params,
    dataset: ReaderDataset,
    collator: ReaderCollator,
    tokenizer,
    batch_size: int,
    mesh=None,
    batch_axis: str = "data",
) -> Dict[str, Any]:
    """Greedy decode + weighted EM over a dataset (reference evaluate,
    train_reader.py:123-169). Returns per-example answers too, for the
    write_results path (test_reader.py:92-105).

    Multi-process: ``dataset`` is this process's shard, ``batch_size`` is
    GLOBAL; every process contributes batch_size/process_count rows per
    compiled call (all processes must join every call, so the batch count
    is synchronized to the largest shard), decodes its own rows, and the
    EM is combined by weighted_average — the reference's rank-sharded eval
    (train_reader.py:165, util.py:266-273) done the SPMD way."""
    world = jax.process_count()
    local_bs = batch_size
    num_batches = None
    if mesh is not None:
        # round the batch up to a multiple of the mesh batch axis so every
        # (pad_final-padded) batch stays sharded — never replicated
        ax = mesh.shape[batch_axis]
        batch_size = -(-batch_size // ax) * ax
        local_bs = batch_size // world
        if world > 1:
            from jax.experimental import multihost_utils

            lens = multihost_utils.process_allgather(
                jnp.asarray(len(dataset), jnp.int32))
            num_batches = int(-(-int(np.max(lens)) // local_bs))
    scores: List[float] = []
    answers: List[str] = []
    indices: List[int] = []
    for batch in batch_iterator(dataset, local_bs, collator, shuffle=False,
                                num_batches=num_batches):
        ids, mask = batch.passage_ids, batch.passage_mask
        if mesh is not None:
            ids = put_global(ids, batch_sharding(mesh, ids.ndim, batch_axis))
            mask = put_global(mask, batch_sharding(mesh, mask.ndim, batch_axis))
        else:
            ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        tokens, _ = generate_fn(params, ids, mask)
        decoded = tokenizer.batch_decode(local_rows(tokens))
        for k, ans in enumerate(decoded):
            if not batch.valid[k]:
                continue
            gold = dataset.get_example(int(batch.index[k]))["answer"]
            scores.append(ems(ans, gold))
            answers.append(ans)
            indices.append(int(batch.index[k]))
    em, total = float(np.mean(scores)) if scores else 0.0, len(scores)
    # cross-process count-weighted mean (reference weighted_average,
    # train_reader.py:165) — passthrough in single-process runs
    from lako_tpu.core.distributed import weighted_average

    em, total = weighted_average(em, total)
    return {
        "em": em,
        "total": total,
        "answers": answers,
        "indices": indices,
    }


def _apply_param_dtype(cfg, params, logger):
    """Master-state dtype policy (core/config.py param_dtype): "float32"
    keeps f32 masters (default); "bfloat16" casts params — and therefore the
    Adam moments tx.init derives from them — to bf16, the measured-floor
    throughput config (artifacts/headline_levers.json).

    Both branches CAST rather than pass through: restored checkpoints carry
    the dtype of the run that wrote them, so resuming a bf16-master run with
    the convergence-safe float32 policy must up-cast the masters (and let
    tx.init rebuild f32 moments), not silently keep bf16 state."""
    if cfg.param_dtype in ("float32", "f32"):
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    if cfg.param_dtype not in ("bfloat16", "bf16"):
        raise ValueError(
            f"param_dtype must be float32|bfloat16, got {cfg.param_dtype!r}")
    logger.info("param_dtype=bfloat16: pure-bf16 master params + moments "
                "(throughput config; f32 masters are the convergence-safe "
                "default)")
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def _cast_opt_like(template_opt, restored_opt):
    """Cast restored optimizer-state float leaves to the policy template's
    dtypes. flax from_bytes restores the CHECKPOINT's dtypes regardless of
    the template, so without this a bf16-policy resume of an f32 checkpoint
    keeps f32 moments forever (optax's b1*mu + (1-b1)*g promotes), and the
    reverse direction runs with bf16 moments under the f32 policy."""
    def cast(t, v):
        if (hasattr(v, "dtype") and hasattr(t, "dtype")
                and jnp.issubdtype(v.dtype, jnp.floating)
                and v.dtype != t.dtype):
            return jnp.asarray(v, t.dtype)
        return v

    return jax.tree_util.tree_map(cast, template_opt, restored_opt)


@dataclass
class ReaderTrainResult:
    best_dev_em: float
    final_step: int
    epochs_run: int
    history: List[Dict[str, float]]
    state: TrainState


def train_reader(
    cfg: ReaderTrainConfig,
    train_examples: Sequence[dict],
    eval_examples: Sequence[dict],
    tokenizer,
    init_params: Optional[Any] = None,
    t5_config=None,
    mesh=None,
    save_checkpoints: bool = True,
    resume_from: Optional[str] = None,
    reset_params: bool = True,
) -> ReaderTrainResult:
    """resume_from: checkpoint dir to restore from. reset_params=True restores
    model weights only (fresh optimizer — the reference's warm-start path,
    util.py:124-146 with reset_params); False restores optimizer state, step and
    best metric too (crash/preemption resume)."""
    logger = get_logger()
    mesh = mesh or make_mesh(cfg.mesh)
    t5_cfg = t5_config or t5_config_for_size(cfg.model_size, vocab_size=tokenizer.vocab_size)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = FiDT5(t5_cfg, dtype=dtype, use_remat=cfg.use_remat,
                  remat_policy=cfg.remat_policy)

    train_ds = ReaderDataset(train_examples, cfg.data, seed=cfg.seed)
    eval_ds = ReaderDataset(eval_examples, cfg.data, seed=cfg.seed)
    collator = ReaderCollator(cfg.data, tokenizer)

    global_batch = cfg.per_device_batch_size * mesh.shape[cfg.mesh.batch_axis]
    # Multi-process: train_ds is this process's shard (load_reader_data's
    # k % world == rank split); each process feeds global_batch/world rows
    # per step and the step count is synchronized to the SMALLEST shard so
    # every process joins every compiled collective (no ragged deadlock).
    world = jax.process_count()
    local_batch = global_batch // max(1, world)
    if world > 1:
        if global_batch % world:
            raise ValueError(
                f"global batch {global_batch} not divisible by "
                f"{world} processes")
        from jax.experimental import multihost_utils

        lens = multihost_utils.process_allgather(
            jnp.asarray(len(train_ds), jnp.int32))
        steps_per_epoch = int(np.min(lens)) // local_batch
    else:
        steps_per_epoch = len(train_ds) // global_batch
    total_steps = max(1, steps_per_epoch * cfg.epochs)
    warmup = int(total_steps * cfg.warmup_fraction)  # reference train_reader.py:261
    optim_cfg = cfg.optim.replace(
        warmup_steps=warmup, total_steps=total_steps, scheduler="linear"
    )
    tx = make_optimizer(optim_cfg)

    rng = jax.random.PRNGKey(cfg.seed)
    if init_params is None:
        B, N, L = 2, cfg.data.n_passages, cfg.data.text_maxlength
        init_rng, rng = jax.random.split(rng)
        variables = model.init(
            init_rng,
            jnp.zeros((B, N, L), jnp.int32),
            jnp.ones((B, N, L), bool),
            jnp.zeros((B, cfg.data.answer_maxlength), jnp.int32),
        )
        init_params = variables["params"]
    init_params = _apply_param_dtype(cfg, init_params, logger)
    use_pp = cfg.mesh.pipe > 1
    best_dev_em, step = 0.0, 0
    # PP full resume (params + optimizer) reads the checkpoint ONCE inside
    # the PP branch below, where the placed optimizer state provides the
    # deserialization template; every other resume shape loads here.
    if resume_from is not None and not (use_pp and not reset_params):
        opt_template = (tx.init(init_params)
                        if not (reset_params or use_pp) else None)
        params, opt_state, meta = load_checkpoint(resume_from, init_params,
                                                  opt_template)
        # restored leaves carry the CHECKPOINT's dtype — re-apply the policy
        init_params = _apply_param_dtype(cfg, params, logger)
        if not use_pp:
            init_params = jax.tree_util.tree_map(
                lambda x: put_global(x, replicated(mesh)), init_params)
            state = TrainState.create(init_params, tx)
            if not reset_params and opt_state is not None:
                step = int(meta.get("step", 0))
                best_dev_em = float(meta.get("best_eval_metric", 0.0))
                # restored moments carry the checkpoint's dtype — re-apply
                # the param_dtype policy (the fresh state is the template)
                opt_state = _cast_opt_like(state.opt_state, opt_state)
                state = state.replace(
                    opt_state=jax.tree_util.tree_map(
                        lambda x: put_global(x, replicated(mesh)),
                        opt_state),
                    step=put_global(np.asarray(step, np.int32),
                                    replicated(mesh)))
            elif not reset_params:
                logger.warning("requested optimizer resume but checkpoint "
                               "has no optimizer state; starting fresh")
    if use_pp:
        # pipeline-parallel layout: block stacks + optimizer state live 1/S
        # per pipe device (parallel/pp_train.py); checkpoints keep params in
        # the canonical tree (portable) and the optimizer state in the PP
        # layout (flax serialization handles the PPParams-shaped pytrees)
        from lako_tpu.parallel.pp_train import (fid_params_from_pp,
                                                make_pp_train_step,
                                                place_pp_params,
                                                pp_params_from_fid)

        if t5_cfg.dropout_rate > 0.0:
            logger.warning("mesh.pipe>1: the PP train step runs without "
                           "dropout (set dropout_rate=0 to silence)")
        pp = place_pp_params(
            mesh, pp_params_from_fid(init_params, t5_cfg, cfg.mesh.pipe),
            pipe_axis=cfg.mesh.pipe_axis)
        state = TrainState.create(pp, tx)
        if resume_from is not None and not reset_params:
            # one checkpoint read for params AND optimizer (the fresh
            # placed state above is the opt deserialization template);
            # loaded weights then replace the fresh pp
            params, pp_opt, meta = load_checkpoint(resume_from, init_params,
                                                   state.opt_state)
            # same policy re-application as the non-PP resume path: the
            # restored canonical tree carries the CHECKPOINT's dtype, and
            # pp_params_from_fid/place_pp_params deliberately never cast
            params = _apply_param_dtype(cfg, params, logger)
            pp = place_pp_params(
                mesh, pp_params_from_fid(params, t5_cfg, cfg.mesh.pipe),
                pipe_axis=cfg.mesh.pipe_axis)
            state = state.replace(params=pp)
            if pp_opt is not None:
                # param-derived leaves keep their 1/S pipe placement; fresh
                # scalars in the template (schedule counts etc.) are
                # uncommitted single-device arrays — replicate those on the
                # mesh so the restored state is consistently committed
                from jax.sharding import SingleDeviceSharding

                def _placement(t):
                    if isinstance(t.sharding, SingleDeviceSharding):
                        return replicated(mesh)
                    return t.sharding

                pp_opt = _cast_opt_like(state.opt_state, pp_opt)
                pp_opt = jax.tree_util.tree_map(
                    lambda t, v: jax.device_put(v, _placement(t)),
                    state.opt_state, pp_opt)
                step = int(meta.get("step", 0))
                best_dev_em = float(meta.get("best_eval_metric", 0.0))
                state = state.replace(
                    opt_state=pp_opt,
                    step=put_global(np.asarray(step, np.int32),
                                    replicated(mesh)))
            else:
                logger.warning("PP resume: checkpoint has no (matching) "
                               "optimizer state; starting the optimizer "
                               "fresh")
        pp_step = make_pp_train_step(
            mesh, t5_cfg, cfg.pp_microbatches, dtype=dtype,
            remat=cfg.use_remat, pipe_axis=cfg.mesh.pipe_axis,
            data_axis=cfg.mesh.batch_axis, schedule=cfg.pp_schedule)
        train_step = lambda s, ids, mask, labels, rng: pp_step(
            s, ids, mask, labels)
        to_eval_params = lambda s: fid_params_from_pp(s.params, t5_cfg)
        to_ckpt = lambda s: (fid_params_from_pp(s.params, t5_cfg),
                             s.opt_state)
    else:
        if resume_from is None:
            init_params = jax.tree_util.tree_map(
                lambda x: put_global(x, replicated(mesh)), init_params)
            state = TrainState.create(init_params, tx)
        train_step = make_reader_train_step(model, backend=cfg.train_backend)
        to_eval_params = lambda s: s.params
        to_ckpt = lambda s: (s.params, s.opt_state)
    generate_fn = make_best_generate_fn(
        model, max_length=cfg.eval_max_length, backend=cfg.decode_backend,
        kv_dtype=cfg.decode_kv_dtype,
        weights_dtype=cfg.decode_weights_dtype,
        chunk_size=cfg.decode_chunk_size,
        self_attn_impl=cfg.decode_self_attn_impl)

    patience = 0
    history: List[Dict[str, float]] = []
    ckpt_dir = f"{cfg.checkpoint_dir}/{cfg.name}"
    epoch = 0
    # profile_dir: trace local steps 3-5 of THIS process (past the compile
    # step) into an xprof/TensorBoard trace (core/profiling.py). Counted
    # from process start, not the global resumed ``step`` — otherwise a
    # resumed run (step restored > 2) would silently never trace.
    trace_pending = cfg.profile_dir is not None
    trace_active = False
    local_step = 0
    for epoch in range(1, cfg.epochs + 1):
        t0 = time.time()
        losses = []
        for batch in batch_iterator(
            train_ds, local_batch, collator,
            shuffle=True, seed=cfg.seed + epoch, drop_last=True, prefetch=2,
            num_batches=steps_per_epoch if world > 1 else None,
        ):
            if trace_pending and local_step == 2:
                jax.profiler.start_trace(cfg.profile_dir)
                trace_pending, trace_active = False, True
            sharded = shard_batch(mesh, {
                "ids": batch.passage_ids, "mask": batch.passage_mask,
                "labels": batch.labels,
            })
            state, loss = train_step(state, sharded["ids"], sharded["mask"],
                                     sharded["labels"], rng)
            losses.append(loss)
            step += 1
            local_step += 1
            if trace_active and local_step >= 5:
                loss.block_until_ready()
                jax.profiler.stop_trace()
                trace_active = False
            if preemption.preempted():
                # rank-0-only writes (reference util.py:105: main-rank save)
                preemption.handle_preemption(lambda: save_checkpoint(
                    ckpt_dir, "preempted", *to_ckpt(state),
                    step, best_dev_em)
                    if save_checkpoints and process_is_main() else None)
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

        if epoch % cfg.eval_every and epoch != cfg.epochs:
            # eval_every > 1 skips the per-epoch dev decode (the wall-clock
            # bound when epochs are short); the final epoch always evaluates.
            # Patience/best-dev then advance only on evaluated epochs —
            # eval_every=1 is the reference's evaluate-every-epoch semantics
            # (train_reader.py:87).
            history.append({"epoch": epoch, "loss": train_loss,
                            "seconds": time.time() - t0})
            logger.info("epoch %d | step %d | train loss: %.3f | %.1fs",
                        epoch, step, train_loss, time.time() - t0)
            continue

        patience += 1
        ev = evaluate_reader(generate_fn, to_eval_params(state), eval_ds, collator,
                             tokenizer, cfg.eval_batch_size, mesh,
                             batch_axis=cfg.mesh.batch_axis)
        dev_em = ev["em"]
        history.append({"epoch": epoch, "loss": train_loss, "em": dev_em,
                        "seconds": time.time() - t0})
        logger.info(
            "epoch %d | step %d | train loss: %.3f | evaluation: %.2fEM | %.1fs",
            epoch, step, train_loss, 100 * dev_em, time.time() - t0,
        )
        if dev_em > best_dev_em:
            patience = 0
            best_dev_em = dev_em
            if save_checkpoints and process_is_main():
                save_checkpoint(ckpt_dir, "best_dev", *to_ckpt(state),
                                step, best_dev_em)
        if save_checkpoints and process_is_main():
            # refreshed every epoch for crash/preemption resume (the reference
            # only writes on improvement; `latest` then points here). Written
            # by rank 0 only (reference src/util.py is_main guard); dev_em is
            # already the weighted_average, identical on every process, so
            # best-dev decisions stay in lockstep.
            save_checkpoint(ckpt_dir, "last", *to_ckpt(state),
                            step, best_dev_em)
        if patience > cfg.early_stop:
            logger.info("early stop in epoch %d", epoch)
            break

    if trace_active:   # run shorter than 5 steps: close the trace cleanly
        jax.profiler.stop_trace()
    return ReaderTrainResult(best_dev_em, step, epoch, history, state)
