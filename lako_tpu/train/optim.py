"""Optimizers and LR schedules via optax.

Matches the reference's choices (src/util.py:149-245): Adam or AdamW, fixed or
warmup-linear schedule (same lr_lambda shape), gradient clipping by global norm
(train_reader.py:76), no weight decay on biases/LayerNorm weights, and optional
layerwise LR decay over BERT encoder layers with the reference's
``decay ** (7 - i)`` exponent (src/util.py:185-227).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from lako_tpu.core.config import OptimConfig


def warmup_linear_schedule(
    base_lr: float,
    warmup_steps: int,
    scheduler_steps: int,
    min_ratio: float = 0.0,
    fixed_lr: bool = False,
) -> Callable:
    """Reference WarmupLinearScheduler.lr_lambda (src/util.py:149-168)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (1 - min_ratio) * step / max(1, warmup_steps) + min_ratio
        if fixed_lr:
            post = jnp.asarray(1.0, jnp.float32)
        else:
            post = jnp.maximum(
                0.0,
                1.0 + (min_ratio - 1.0) * (step - warmup_steps)
                / max(1.0, scheduler_steps - warmup_steps),
            )
        return base_lr * jnp.where(step < warmup_steps, warm, post)

    return schedule


def _no_decay_mask(params) -> Any:
    """True where weight decay applies. T5/BERT convention: no decay on biases and
    (layer)norm weights (reference src/util.py:188)."""

    def is_decay(path, _):
        keys = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(str(k) for k in keys)
        if keys and keys[-1] == "bias":
            return False
        if "ln" in joined or "norm" in joined.lower() or "layernorm" in joined.lower():
            return False
        if keys and keys[-1] == "weight" and len(keys) >= 2 and (
            "ln" in str(keys[-2]) or "norm" in str(keys[-2]).lower()
        ):
            return False
        return True

    return jax.tree_util.tree_map_with_path(is_decay, params)


def _layerwise_factor(path, decay: float,
                      layer_key_prefix: str = "layer_") -> float:
    """``decay ** (7 - i)`` for params whose path contains ``layer_{i}``
    (reference indexes BERT encoder layers the same way), else 1.0."""
    for k in path:
        key = str(getattr(k, "key", k))
        if key.startswith(layer_key_prefix):
            try:
                i = int(key[len(layer_key_prefix):])
            except ValueError:
                continue
            return decay ** (7 - i)
    return 1.0


def _layerwise_scale(decay: float, layer_key_prefix: str = "layer_") -> optax.GradientTransformation:
    """Scale updates per-layer by :func:`_layerwise_factor`."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map_with_path(
            lambda path, u: u * _layerwise_factor(path, decay,
                                                  layer_key_prefix),
            updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_adam(correct_bias: bool, b1: float, b2: float,
                   eps: float) -> optax.GradientTransformation:
    """Adam second-moment scaling with the bias correction switchable.

    correct_bias=False replicates HF's AdamW(correct_bias=False) used by the
    reference's layerwise_decay_optimizer (src/util.py:224): raw EMA moments,
    update = m / (sqrt(v) + eps)."""
    if correct_bias:
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, updates)
        upd = jax.tree_util.tree_map(
            lambda m, v: m / (jnp.sqrt(v) + eps), mu, nu)
        return upd, optax.ScaleByAdamState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _hf_decoupled_decay(weight_decay: float, lr_schedule, mask_fn,
                        layerwise_decay=None) -> optax.GradientTransformation:
    """HF AdamW's weight-decay order: ``p -= lr*adam_u; p -= lr*wd*p``.

    Applied AFTER learning-rate scaling (incoming update u = −lr·adam_u), this
    adds ``−lr·wd·(p + u)`` — decaying the post-Adam-step parameters, exactly
    as HF does, where optax's add_decayed_weights decays the pre-step ones
    (an O(lr²·wd) divergence per step).

    With layerwise_decay set, HF's layerwise_decay_optimizer
    (reference src/util.py:216-229) builds per-GROUP lr = lr·decay^depth, and
    that group lr governs the decay term too — so the decay here is scaled by
    the same :func:`_layerwise_factor` as the update."""

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("params required for decoupled weight decay")
        lr = lr_schedule(state.count) if callable(lr_schedule) else lr_schedule
        mask = mask_fn(params)

        def apply(path, u, p, m):
            if not m:
                return u
            f = (1.0 if layerwise_decay is None
                 else _layerwise_factor(path, layerwise_decay))
            return u - (lr * f) * weight_decay * (p + u)

        new_updates = jax.tree_util.tree_map_with_path(
            apply, updates, params, mask)
        return new_updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimConfig, params_example: Optional[Any] = None) -> optax.GradientTransformation:
    """Process-cached by config: TrainState stores the transformation as a
    static (non-pytree) field, so jit keys on its identity — a fresh tx per
    invocation would force a retrace of an otherwise-cached train step
    (core/program_cache.py rationale). Equal configs → same tx object.

    ``params_example`` is accepted for API compatibility but unused (no
    per-shape specialization exists); caching ignores it."""
    from lako_tpu.core.program_cache import cached_program

    return cached_program(("optimizer", cfg), lambda: _build_optimizer(cfg))


def _build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    scheduler_steps = cfg.scheduler_steps or cfg.total_steps
    if cfg.scheduler == "linear":
        lr = warmup_linear_schedule(cfg.lr, cfg.warmup_steps, scheduler_steps,
                                    cfg.min_ratio, cfg.fixed_lr)
    else:
        lr = cfg.lr

    if cfg.optim == "adafactor":
        # Factored second moments (Shazeer & Stern 2018): optimizer state is
        # O(rows+cols) per matrix instead of O(rows*cols) — the standard TPU
        # answer for t5-3b/11b readers, where AdamW's f32 m/v alone
        # (8 bytes/param) exceed a v5e's 16 GB HBM. Beyond the reference's
        # surface (it trains t5-large with AdamW); the reference-parity
        # optimizers below stay the default.
        # NOTE: cfg.weight_decay is deliberately NOT forwarded — optax applies
        # adafactor's weight_decay_rate AFTER lr scaling (decay = rate·p per
        # step, not lr·rate·p), so the AdamW-scale default of 0.1 would shrink
        # every parameter by 10% per step. T5-style adafactor training runs
        # without decoupled weight decay.
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.clip),
            optax.adafactor(learning_rate=lr,
                            multiply_by_parameter_scale=True,
                            clipping_threshold=1.0))
        if cfg.accumulation_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
        return tx

    chain = [optax.clip_by_global_norm(cfg.clip)]
    if cfg.optim == "adam":
        # torch.optim.Adam bias-corrects (reference src/util.py:232)
        correct = True if cfg.adam_correct_bias is None else cfg.adam_correct_bias
        chain.append(_scale_by_adam(correct, cfg.adam_b1, cfg.adam_b2, cfg.adam_eps))
    elif cfg.optim == "adamw":
        # HF AdamW(correct_bias=False) (reference src/util.py:224)
        correct = False if cfg.adam_correct_bias is None else cfg.adam_correct_bias
        chain.append(_scale_by_adam(correct, cfg.adam_b1, cfg.adam_b2, cfg.adam_eps))
    elif cfg.optim == "adamw8bit":
        # AdamW with blockwise int8/uint8 moments + stochastic rounding
        # (train/optim8.py): 2 bytes/param of state instead of 8 — the
        # optimizer-bandwidth/memory knob for big readers. Same chain
        # (clip, layerwise decay, HF decoupled decay) as "adamw".
        from lako_tpu.train.optim8 import scale_by_adam_8bit

        correct = False if cfg.adam_correct_bias is None else cfg.adam_correct_bias
        chain.append(scale_by_adam_8bit(
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            correct_bias=correct))
    else:
        raise ValueError(cfg.optim)
    if cfg.layerwise_decay is not None:
        chain.append(_layerwise_scale(cfg.layerwise_decay))
    chain.append(optax.scale_by_learning_rate(lr))
    if cfg.optim in ("adamw", "adamw8bit") and cfg.weight_decay > 0:
        chain.append(_hf_decoupled_decay(cfg.weight_decay, lr, _no_decay_mask,
                                         layerwise_decay=cfg.layerwise_decay))
    tx = optax.chain(*chain)
    if cfg.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
    return tx
