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


def _layerwise_scale(decay: float, layer_key_prefix: str = "layer_") -> optax.GradientTransformation:
    """Scale updates per-layer by ``decay ** (7 - i)`` for params whose path
    contains ``layer_{i}`` (reference indexes BERT encoder layers the same way)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale(path, u):
            for k in path:
                key = str(getattr(k, "key", k))
                if key.startswith(layer_key_prefix):
                    try:
                        i = int(key[len(layer_key_prefix):])
                    except ValueError:
                        continue
                    return u * (decay ** (7 - i))
            return u

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimConfig, params_example: Optional[Any] = None) -> optax.GradientTransformation:
    scheduler_steps = cfg.scheduler_steps or cfg.total_steps
    if cfg.scheduler == "linear":
        lr = warmup_linear_schedule(cfg.lr, cfg.warmup_steps, scheduler_steps,
                                    cfg.min_ratio, cfg.fixed_lr)
    else:
        lr = cfg.lr

    chain = [optax.clip_by_global_norm(cfg.clip)]
    if cfg.optim == "adam":
        chain.append(optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps))
    elif cfg.optim == "adamw":
        chain.append(optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps))
        if cfg.weight_decay > 0:
            chain.append(optax.add_decayed_weights(cfg.weight_decay, mask=_no_decay_mask))
    else:
        raise ValueError(cfg.optim)
    if cfg.layerwise_decay is not None:
        chain.append(_layerwise_scale(cfg.layerwise_decay))
    chain.append(optax.scale_by_learning_rate(lr))
    tx = optax.chain(*chain)
    if cfg.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
    return tx
