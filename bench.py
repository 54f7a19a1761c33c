"""Benchmark: t5-large FiD reader training throughput (examples/sec) on TPU.

Config mirrors the reference's headline training setup (run_okvqa_train.sh:6-10:
t5-large, batch 8, stream 2 → N=2 passages, text_maxlength 130): one full
jitted train step (forward + backward + AdamW update) in bfloat16 with encoder
remat.

vs_baseline compares against BASELINE_EXAMPLES_PER_SEC, an estimate of the
PyTorch reference on its single-GPU setup (V100-class, fp32, batch 8: ~1.5 s/step
→ ~5.3 ex/s). The reference repo publishes no timing (BASELINE.md), so this
anchor is documented here and held fixed across rounds for comparability.
"""

import json
import time

BASELINE_EXAMPLES_PER_SEC = 5.3


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

    B, N, L, T = 8, 2, 130, 20
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (B, N, L), 0, cfg.vocab_size, dtype=jnp.int32)
    mask = jnp.ones((B, N, L), dtype=bool)
    labels = jax.random.randint(rng, (B, T), 0, cfg.vocab_size, dtype=jnp.int32)

    params = jax.jit(lambda r: model.init(r, ids, mask, labels)["params"])(rng)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    tx = make_optimizer(OptimConfig(optim="adamw", lr=4e-5, weight_decay=0.1,
                                    scheduler="linear", warmup_steps=100,
                                    total_steps=10_000))
    state = TrainState.create(params, tx)

    @jax.jit
    def train_step(state, ids, mask, labels):
        def loss_fn(p):
            loss, _, _ = model.apply({"params": p}, ids, mask, labels)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    # warmup / compile. NOTE: on the tunneled backend block_until_ready alone
    # under-reports; a host transfer of a value that depends on the chained
    # computation is the only reliable fence.
    for _ in range(3):
        state, loss = train_step(state, ids, mask, labels)
    assert not float(loss) != float(loss), "training step produced NaN loss"

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = train_step(state, ids, mask, labels)
    _ = float(loss)  # forced device->host sync through the full step chain
    dt = time.perf_counter() - t0

    examples_per_sec = B * n_steps / dt
    print(json.dumps({
        "metric": "t5_large_fid_train_examples_per_sec",
        "value": round(examples_per_sec, 2),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / BASELINE_EXAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
