"""Retriever-distillation train-step throughput + MFU.

The reader train step has a measured roofline (bench_train_roofline.py);
this gives the OTHER trained model — the BERT bi-encoder distilled from
reader cross-attention (reference train_retriever.py:37-154, batch 8,
n_context 10, maxlength 130) — the same treatment: full jitted
fwd+bwd+AdamW step with donated state, bf16, KL loss against gold scores.

MFU counts non-embedding encoder + projection params at 6 FLOPs per
param-token (2 fwd + 4 bwd); embedding lookups are gathers, and the
(B,n)-score einsum + KL are negligible. Tokens/step = B*Lq + B*n*Lp —
at the reference config the 10 passages dominate (11x the question rows).

Measured (v5e, r3): the reference L=130 pads the attention minor dim
130 -> 256 lanes (the (rows, 12, 130, 130) logits/softmax/AV chain runs
at ~2x width), and BERT is L^2-heavy at this depth: tile-aligned L=128
is 36% faster at B=8 (52.4 vs 71.3 ms) and 58% faster at B=32 (227 vs
358 ms) for 2 fewer tokens of fact tail. Decomposition at L=130
(fwd/bwd/opt): B=8 = 26.5/44.7/~0 ms, B=32 = 114.6/218.4/~25 ms — the
slowdown is uniform across fwd+bwd, not optimizer- or dispatch-bound.
B=8 (the reference batch) is also the per-example optimum at both
lengths; batch scaling is mildly inverse (f32 attention temp traffic
grows with rows).

Run (TPU): python scripts/bench_retriever_train.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def retriever_flops_per_step(params, B, n, Lq, Lp):
    """6 * non-embedding params * tokens (questions + passages)."""
    import jax

    def count(tree, skip_embed):
        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = "/".join(str(p) for p in path).lower()
            if skip_embed and "embed" in name:
                continue
            total += leaf.size
        return total

    p_active = count(params, skip_embed=True)
    tokens = B * Lq + B * n * Lp
    return 6.0 * p_active * tokens


def main():
    import jax
    import jax.numpy as jnp

    from lako_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import V5E_PEAK_BF16_FLOPS
    from lako_tpu.core.config import OptimConfig, RetrieverConfig
    from lako_tpu.models.retriever import Retriever
    from lako_tpu.train.optim import make_optimizer
    from lako_tpu.train.state import TrainState

    cfg = RetrieverConfig()
    cfg = cfg.replace(bert=cfg.bert.replace(hidden_dropout_prob=0.0,
                                            attention_probs_dropout_prob=0.0))
    n = 10
    model = Retriever(cfg, dtype=jnp.bfloat16)
    out = {"config": {"n_context": n,
                      "ref_maxlength": cfg.passage_maxlength,
                      "indexing_dimension": cfg.indexing_dimension}}

    def build(B, Lq, Lp):
        rng = jax.random.PRNGKey(0)
        q_ids = jax.random.randint(rng, (B, Lq), 0, cfg.bert.vocab_size,
                                   dtype=jnp.int32)
        q_mask = jnp.ones((B, Lq), dtype=bool)
        p_ids = jax.random.randint(rng, (B, n, Lp), 0, cfg.bert.vocab_size,
                                   dtype=jnp.int32)
        p_mask = jnp.ones((B, n, Lp), dtype=bool)
        gold = jax.nn.softmax(jax.random.normal(rng, (B, n)), axis=-1)
        params = jax.jit(lambda r: model.init(
            r, q_ids, q_mask, p_ids, p_mask)["params"])(rng)
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                        params)
        return params, q_ids, q_mask, p_ids, p_mask, gold

    # reference maxlength 130 (train_retriever.py: question/passage_maxlength)
    # and the tile-aligned 128 throughput config, each at the reference batch
    # and the first scale-up
    for L, B in ((130, 8), (130, 32), (128, 8), (128, 32)):
        key = f"l{L}_b{B}"
        try:
            Lq = Lp = L
            params, q_ids, q_mask, p_ids, p_mask, gold = build(B, Lq, Lp)
            flops = retriever_flops_per_step(params, B, n, Lq, Lp)
            tx = make_optimizer(OptimConfig(
                optim="adamw", lr=1e-4, weight_decay=1e-4,
                scheduler="linear", warmup_steps=100, total_steps=10_000))
            state = TrainState.create(params, tx)

            @(lambda f: jax.jit(f, donate_argnums=(0,)))
            def step(state, qi, qm, pi, pm, g):
                def loss_fn(p):
                    _, _, _, loss = model.apply(
                        {"params": p}, qi, qm, pi, pm, g)
                    return loss

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                return state.apply_gradients(grads), loss

            for _ in range(3):
                state, loss = step(state, q_ids, q_mask, p_ids, p_mask, gold)
            _ = float(loss)
            t0 = time.perf_counter()
            n_it = 10
            for _ in range(n_it):
                state, loss = step(state, q_ids, q_mask, p_ids, p_mask, gold)
            _ = float(loss)
            dt = (time.perf_counter() - t0) / n_it
            out[key] = {
                "ms": round(1e3 * dt, 1),
                "ex_per_sec": round(B / dt, 1),
                "mfu_pct": round(100 * flops / (dt * V5E_PEAK_BF16_FLOPS), 1),
            }
            del state, params
            import gc

            gc.collect()
        except Exception as e:  # noqa: BLE001 — OOM rows reported, not fatal
            out[key] = {"error": str(e)[:200]}
        print(json.dumps({k: v for k, v in out.items() if k == key}),
              flush=True)

    print(json.dumps(out))
    Path("artifacts").mkdir(exist_ok=True)
    Path("artifacts/retriever_roofline.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
