"""On-chip A/B: AdamW vs 8-bit AdamW on the t5-large B=32 train step.

The train roofline (artifacts/train_roofline.json) prices the optimizer
segment at 12.3 ms — a bandwidth floor: with bf16 master params the
moments inherit bf16 (train/optim.py:_scale_by_adam zeros_like), so the
update streams ~5.9 GB of moment traffic + ~2.9 GB params + ~1.5 GB grads
~= 10.3 GB ~= 12.6 ms at 819 GB/s, which matches. adamw8bit halves the
moment bytes (int8 q + 1/256 scales, read+write) for an expected ~3 GB /
~3.6 ms saving, minus the cost of generating ~1.5 G uniform samples for
stochastic rounding. This script measures: full step with each optimizer,
and the optimizer-only delta (step minus fwd+bwd), plus state bytes.

Run (TPU): python scripts/bench_optim8.py
Results -> artifacts/optim8_ab.json
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from lako_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from lako_tpu.core.config import OptimConfig, t5_config_for_size
    from lako_tpu.models.t5 import FiDT5
    from lako_tpu.train.optim import make_optimizer
    from lako_tpu.train.state import TrainState

    cfg = t5_config_for_size("large", dropout_rate=0.0)
    model = FiDT5(cfg, dtype=jnp.bfloat16, use_remat=True)
    B, N, L, T = 32, 2, 128, 20
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (B, N, L), 0, cfg.vocab_size,
                             dtype=jnp.int32)
    mask = jnp.ones((B, N, L), dtype=bool)
    labels = jax.random.randint(rng, (B, T), 0, cfg.vocab_size,
                                dtype=jnp.int32)
    params0 = jax.jit(lambda r: model.init(r, ids, mask, labels)["params"])(
        rng)
    params0 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                     params0)

    def time_step(optim_name):
        if optim_name == "adamw8bit_jnp":
            # the jnp fallback formulation, for the kernel-vs-XLA delta
            import optax

            from lako_tpu.train.optim import _hf_decoupled_decay, \
                _no_decay_mask, warmup_linear_schedule
            from lako_tpu.train.optim8 import scale_by_adam_8bit

            lr = warmup_linear_schedule(4e-5, 100, 10_000)
            tx = optax.chain(
                optax.clip_by_global_norm(1.0),
                scale_by_adam_8bit(use_kernel="never"),
                optax.scale_by_learning_rate(lr),
                _hf_decoupled_decay(0.1, lr, _no_decay_mask))
        else:
            tx = make_optimizer(OptimConfig(
                optim=optim_name, lr=4e-5, weight_decay=0.1,
                scheduler="linear", warmup_steps=100, total_steps=10_000))
        params = jax.tree_util.tree_map(
            lambda a: jnp.array(a, copy=True), params0)
        state = TrainState.create(params, tx)
        state_bytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(state.opt_state)
            if hasattr(x, "size"))

        @jax.jit
        def fwd_bwd(p, ids, mask, labels):
            def lf(pp):
                loss, _, _ = model.apply({"params": pp}, ids, mask, labels)
                return loss

            return jax.value_and_grad(lf)(p)

        @(lambda f: jax.jit(f, donate_argnums=(0,)))
        def train_step(state, ids, mask, labels):
            loss, grads = jax.value_and_grad(
                lambda p: model.apply({"params": p}, ids, mask, labels)[0]
            )(state.params)
            return state.apply_gradients(grads), loss

        for _ in range(6):
            state, loss = train_step(state, ids, mask, labels)
        assert float(loss) == float(loss), "NaN"
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = train_step(state, ids, mask, labels)
        _ = float(loss)
        step_ms = (time.perf_counter() - t0) / n * 1e3

        # fwd+bwd alone (same params tree, no optimizer)
        p = state.params
        loss, g = fwd_bwd(p, ids, mask, labels)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(n):
            loss, g = fwd_bwd(p, ids, mask, labels)
        _ = float(loss)
        fb_ms = (time.perf_counter() - t0) / n * 1e3
        del state, p, g
        return {"step_ms": round(step_ms, 1), "fwd_bwd_ms": round(fb_ms, 1),
                "optimizer_delta_ms": round(step_ms - fb_ms, 1),
                "opt_state_bytes": state_bytes,
                "examples_per_sec": round(B * 1e3 / step_ms, 1)}

    out = {}
    for name in ("adamw", "adamw8bit", "adamw8bit_jnp"):
        out[name] = time_step(name)
        print(f"[optim8] {name}: {out[name]}", flush=True)

    print(json.dumps(out))
    art = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    art.mkdir(exist_ok=True)
    (art / "optim8_ab.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
