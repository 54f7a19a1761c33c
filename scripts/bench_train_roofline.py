"""Train-step roofline decomposition (VERDICT r2 #5).

Breaks the t5-large B=32 N=2 L=128 T=20 bf16 train step into measured
segments — encoder forward, full forward(+loss), forward+backward,
full step (+AdamW) — under remat on/off, and sweeps the batch size, so the
MFU number in bench.py is either raised or pinned to an explained floor.

Executed-FLOPs accounting (why model-FLOPs MFU cannot reach 100% here):
model FLOPs = 6·P·tok ≈ 18.8 TFLOP at B=32 (with cross-K/V at encoder
tokens). On top of that the hardware actually executes: +~0.4 TFLOP of
attention score/context matmuls (not in 6·P), +5.8 TFLOP of encoder
recompute when remat is on, plus bandwidth-bound segments that occupy wall
time but almost no MXU: f32 attention-logit materialization (~67 MB/layer),
layer norms/residuals, and the AdamW update (~5 GB of param/moment traffic
≈ 6 ms at 819 GB/s). See the printed table.

Run (TPU): python scripts/bench_train_roofline.py
       python scripts/bench_train_roofline.py --config ref   # B=8 headline

--config ref decomposes the B=8 L=130 headline config the same way
(run_okvqa_train.sh:6-10). MEASURED r3 (artifacts/train_roofline_ref.json,
non-donated segment timing): full step 89.8 ms = encoder fwd 14.0 +
decoder/loss 4.0 + backward 37.4 + optimizer 34.4; model matmuls at peak
need only 24.2 ms. Two structural facts fall out: (a) the optimizer
segment is batch-INDEPENDENT, so at B=8 it is ~38% of the step vs ~8% at
B=32 — small-batch MFU is bounded far below the B=32 optimum no matter
the kernels; (b) 22 ms of that optimizer segment was non-donation state
copies — the production step (train/reader.py:66) donates, so the bench
headline now measures donate=True (A/B: 115.9 -> 125.6 ex/s, 35.1 ->
38.0% MFU). Results land in artifacts/train_roofline_ref.json.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _time_fn(fn, fence, n=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=("b32", "ref"), default="b32",
                    help="b32: the throughput-optimal bench config; "
                         "ref: the reference-faithful B=8 headline config")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lako_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import V5E_PEAK_BF16_FLOPS, _train_flops_per_step
    from lako_tpu.core.config import OptimConfig, t5_config_for_size
    from lako_tpu.models.t5 import FiDT5
    from lako_tpu.train.optim import make_optimizer
    from lako_tpu.train.state import TrainState

    cfg = t5_config_for_size("large", dropout_rate=0.0)
    if cli.config == "ref":
        return _ref_config_decomposition(
            jax, jnp, cfg, V5E_PEAK_BF16_FLOPS, _train_flops_per_step,
            OptimConfig, FiDT5, make_optimizer, TrainState)
    N, L, T = 2, 128, 20
    out = {}

    def build(B, use_remat):
        model = FiDT5(cfg, dtype=jnp.bfloat16, use_remat=use_remat)
        rng = jax.random.PRNGKey(0)
        ids = jax.random.randint(rng, (B, N, L), 0, cfg.vocab_size,
                                 dtype=jnp.int32)
        mask = jnp.ones((B, N, L), dtype=bool)
        labels = jax.random.randint(rng, (B, T), 0, cfg.vocab_size,
                                    dtype=jnp.int32)
        params = jax.jit(lambda r: model.init(r, ids, mask, labels)["params"]
                         )(rng)
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                        params)
        return model, params, ids, mask, labels

    # ---- segment decomposition at the bench config (B=32, remat on) ------
    B = 32
    model, params, ids, mask, labels = build(B, True)
    flops = _train_flops_per_step(params, B, N, L, T)

    enc = jax.jit(lambda p, i, m: model.apply(
        {"params": p}, i, m, method=type(model).encode_passages))
    fwd = jax.jit(lambda p, i, m, l: model.apply({"params": p}, i, m, l)[0])

    # the grads must feed a live output or XLA dead-code-eliminates the
    # entire backward (first version measured fwd_bwd == fwd for exactly
    # this reason); one fused scalar reduction keeps them alive without
    # materializing a second param-sized output
    def _fwdbwd(p, i, m, l):
        loss, grads = jax.value_and_grad(
            lambda q: model.apply({"params": q}, i, m, l)[0])(p)
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss, gsum

    fwdbwd = jax.jit(_fwdbwd)

    fence_arr = lambda o: float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    t_enc = _time_fn(lambda: enc(params, ids, mask), fence_arr)
    t_fwd = _time_fn(lambda: fwd(params, ids, mask, labels),
                     lambda o: float(o))
    t_fb = _time_fn(lambda: fwdbwd(params, ids, mask, labels),
                    lambda o: float(o[0]) + float(o[1]) * 0.0)

    # full step timed with a DONATED state (the production configuration) in
    # its own scope so old/new state buffers never coexist on the 16 GB chip
    tx = make_optimizer(OptimConfig(optim="adamw", lr=4e-5, weight_decay=0.1,
                                    scheduler="linear", warmup_steps=100,
                                    total_steps=10_000))
    state = TrainState.create(params, tx)

    @(lambda f: jax.jit(f, donate_argnums=(0,)))
    def step(state, i, m, l):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply({"params": p}, i, m, l)[0])(state.params)
        return state.apply_gradients(grads), loss

    for _ in range(2):
        state, loss = step(state, ids, mask, labels)
    _ = float(loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, ids, mask, labels)
    _ = float(loss)
    t_step = (time.perf_counter() - t0) / n
    del state
    out["segments_b32_remat_ms"] = {
        "encoder_fwd": round(1e3 * t_enc, 1),
        "full_fwd": round(1e3 * t_fwd, 1),
        "fwd_bwd": round(1e3 * t_fb, 1),
        "full_step": round(1e3 * t_step, 1),
        "optimizer_only_delta": round(1e3 * (t_step - t_fb), 1),
        "bwd_only_delta": round(1e3 * (t_fb - t_fwd), 1),
    }
    out["mfu_b32_remat_pct"] = round(
        100 * flops / (t_step * V5E_PEAK_BF16_FLOPS), 1)
    del params, ids, mask, labels

    # ---- remat off + batch sweep (donated step, the bench configuration) --
    for B_, use_remat in ((32, False), (64, False), (64, True),
                          (128, True)):
        try:
            model_, params_, ids_, mask_, labels_ = build(B_, use_remat)
            tx_ = make_optimizer(OptimConfig(
                optim="adamw", lr=4e-5, weight_decay=0.1,
                scheduler="linear", warmup_steps=100, total_steps=10_000))
            state_ = TrainState.create(params_, tx_)

            @(lambda f: jax.jit(f, donate_argnums=(0,)))
            def dstep(state, i, m, l):
                loss, grads = jax.value_and_grad(
                    lambda p: model_.apply({"params": p}, i, m, l)[0]
                )(state.params)
                return state.apply_gradients(grads), loss

            for _ in range(3):
                state_, loss = dstep(state_, ids_, mask_, labels_)
            _ = float(loss)
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                state_, loss = dstep(state_, ids_, mask_, labels_)
            _ = float(loss)
            dt = (time.perf_counter() - t0) / n
            fl = _train_flops_per_step(params_, B_, N, L, T)
            out[f"b{B_}_remat{int(use_remat)}"] = {
                "ms": round(1e3 * dt, 1),
                "ex_per_sec": round(B_ / dt, 1),
                "mfu_pct": round(100 * fl / (dt * V5E_PEAK_BF16_FLOPS), 1),
            }
            del state_, model_, params_, ids_, mask_, labels_
            import gc

            gc.collect()
        except Exception as e:  # noqa: BLE001 — OOM rows reported, not fatal
            out[f"b{B_}_remat{int(use_remat)}"] = {"error": str(e)[:200]}
            import gc

            gc.collect()
        print(json.dumps({k: out[k] for k in list(out)[-1:]}), flush=True)

    print(json.dumps(out))
    Path("artifacts").mkdir(exist_ok=True)
    Path("artifacts/train_roofline.json").write_text(json.dumps(out, indent=1))


def _ref_config_decomposition(jax, jnp, cfg, peak, flops_fn, OptimConfig,
                              FiDT5, make_optimizer, TrainState):
    """Segment decomposition at the HEADLINE config: B=8, N=2, L=130, T=20,
    remat on, non-donated state — exactly bench.py's reference-faithful row.

    Emits the measured pieces the bench.py docstring cites: encoder fwd,
    full fwd, fwd+bwd, full step, the optimizer delta (which is
    batch-independent — compare b32's 12.3 ms), and the model-matmul time
    at peak for this batch."""
    B, N, L, T = 8, 2, 130, 20
    model = FiDT5(cfg, dtype=jnp.bfloat16, use_remat=True)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (B, N, L), 0, cfg.vocab_size,
                             dtype=jnp.int32)
    mask = jnp.ones((B, N, L), dtype=bool)
    labels = jax.random.randint(rng, (B, T), 0, cfg.vocab_size,
                                dtype=jnp.int32)
    params = jax.jit(lambda r: model.init(r, ids, mask, labels)["params"]
                     )(rng)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    flops = flops_fn(params, B, N, L, T)

    enc = jax.jit(lambda p, i, m: model.apply(
        {"params": p}, i, m, method=type(model).encode_passages))
    fwd = jax.jit(lambda p, i, m, l: model.apply({"params": p}, i, m, l)[0])

    def _fwdbwd(p, i, m, l):
        loss, grads = jax.value_and_grad(
            lambda q: model.apply({"params": q}, i, m, l)[0])(p)
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss, gsum

    fwdbwd = jax.jit(_fwdbwd)
    fence_arr = lambda o: float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    t_enc = _time_fn(lambda: enc(params, ids, mask), fence_arr)
    t_fwd = _time_fn(lambda: fwd(params, ids, mask, labels),
                     lambda o: float(o))
    t_fb = _time_fn(lambda: fwdbwd(params, ids, mask, labels),
                    lambda o: float(o[0]) + float(o[1]) * 0.0)

    # non-donated full step — the bench headline's exact configuration
    tx = make_optimizer(OptimConfig(optim="adamw", lr=4e-5, weight_decay=0.1,
                                    scheduler="linear", warmup_steps=100,
                                    total_steps=10_000))
    state = TrainState.create(params, tx)

    @jax.jit
    def step(state, i, m, l):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply({"params": p}, i, m, l)[0])(state.params)
        return state.apply_gradients(grads), loss

    for _ in range(6):
        state, loss = step(state, ids, mask, labels)
    _ = float(loss)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, ids, mask, labels)
    _ = float(loss)
    t_step = (time.perf_counter() - t0) / n

    out = {
        "config": "B=8 N=2 L=130 T=20 remat, non-donated (bench headline)",
        "segments_ms": {
            "encoder_fwd": round(1e3 * t_enc, 1),
            "full_fwd": round(1e3 * t_fwd, 1),
            "fwd_bwd": round(1e3 * t_fb, 1),
            "full_step": round(1e3 * t_step, 1),
            "optimizer_only_delta": round(1e3 * (t_step - t_fb), 1),
            "bwd_only_delta": round(1e3 * (t_fb - t_fwd), 1),
        },
        "model_matmul_time_at_peak_ms": round(1e3 * flops / peak, 1),
        "mfu_pct": round(100 * flops / (t_step * peak), 1),
        "ex_per_sec": round(B / t_step, 1),
    }
    del state

    # ---- donated-step A/B grid: remat x optimizer (VERDICT r3 #3) --------
    # The production step donates; the decomposition above is non-donated
    # only because segment timing needs live inputs. This grid measures the
    # knobs where the headline is actually decided: remat off (B=8's
    # activations easily fit — remat's encoder recompute is pure waste at
    # this batch) and the optimizer choice (sgd isolates the optimizer
    # segment's donated cost; adamw_fused is the single-pass tree_map).
    import gc

    def timed_donated(use_remat, optim):
        model_ = FiDT5(cfg, dtype=jnp.bfloat16, use_remat=use_remat)
        # real buffer copies: the donated step invalidates its input state,
        # which must not take the shared `params` buffers with it
        params_ = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params)
        if optim == "sgd":
            import optax

            tx_ = optax.sgd(4e-5)
        else:
            tx_ = make_optimizer(OptimConfig(
                optim=optim, lr=4e-5, weight_decay=0.1, scheduler="linear",
                warmup_steps=100, total_steps=10_000))
        state_ = TrainState.create(params_, tx_)

        @(lambda f: jax.jit(f, donate_argnums=(0,)))
        def dstep(state, i, m, l):
            loss, grads = jax.value_and_grad(
                lambda p: model_.apply({"params": p}, i, m, l)[0]
            )(state.params)
            return state.apply_gradients(grads), loss

        for _ in range(6):
            state_, loss = dstep(state_, ids, mask, labels)
        _ = float(loss)
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            state_, loss = dstep(state_, ids, mask, labels)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / n
        del state_
        gc.collect()
        return dt

    grid = {}
    for use_remat, optim in ((True, "adamw"), (False, "adamw"),
                             (False, "sgd"), (True, "sgd")):
        dt = timed_donated(use_remat, optim)
        grid[f"remat{int(use_remat)}_{optim}"] = {
            "ms": round(1e3 * dt, 1),
            "ex_per_sec": round(B / dt, 1),
            "mfu_pct": round(100 * flops / (dt * peak), 1),
        }
        print(json.dumps({k: grid[k] for k in list(grid)[-1:]}), flush=True)
    out["donated_grid"] = grid

    print(json.dumps(out))
    Path("artifacts").mkdir(exist_ok=True)
    Path("artifacts/train_roofline_ref.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
