"""Decode throughput: flax layer-unrolled path vs the stacked scan-over-layers
engine, at the reference eval config (t5-large, B=128, N=2, L=130, greedy
max_length=50 — test_reader.py:65-69, run_okvqa_test.sh:6).

Fencing per the axon-tunnel rules: warm each fn with a host transfer of the
full output before timing; time each fn twice and report the second run
(first-in-process reads carry autotune residue).

Usage: python scripts/bench_decode.py [--quick] [--variants flax,engine,...]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def bench_one(name, fn, args, repeats=3):
    # warmup: full output fence
    out = fn(*args)
    _ = int(np.asarray(out[0]).sum())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = int(np.asarray(out[0]).sum())  # host transfer = true fence
        times.append(time.perf_counter() - t0)
    best = min(times[1:]) if len(times) > 1 else times[0]
    print(f"[bench_decode] {name}: times={['%.3f' % t for t in times]} "
          f"best(after-first)={best:.3f}s", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="t5-base shapes for a fast smoke run")
    ap.add_argument("--variants", default="flax,engine,engine_int8,engine_chunk8")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--length", type=int, default=130)
    ap.add_argument("--max-length", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lako_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from lako_tpu.core.config import t5_config_for_size
    from lako_tpu.models.t5 import FiDT5
    from lako_tpu.models.t5.decode import make_generate_fn
    from lako_tpu.models.t5.engine import make_engine_generate_fn

    size = "base" if args.quick else "large"
    cfg = t5_config_for_size(size, dropout_rate=0.0)
    model = FiDT5(cfg, dtype=jnp.bfloat16, use_remat=False)

    B, N, L = args.batch, 2, args.length
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (B, N, L), 0, cfg.vocab_size, dtype=jnp.int32)
    mask = jnp.ones((B, N, L), dtype=bool)
    labels = jnp.zeros((B, 8), jnp.int32)
    print(f"[bench_decode] init {size} params...", flush=True)
    params = jax.jit(lambda r: model.init(r, ids, mask, labels)["params"])(rng)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    make = {
        "flax": lambda: make_generate_fn(model, max_length=args.max_length),
        "engine": lambda: make_engine_generate_fn(
            model, max_length=args.max_length),
        "engine_int8": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, kv_dtype="int8"),
        "engine_w8": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, weights_dtype="int8"),
        "engine_w8kv8": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, weights_dtype="int8",
            kv_dtype="int8"),
        "engine_unroll_w8kv8": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, weights_dtype="int8",
            kv_dtype="int8", layer_unroll=model.config.num_decoder_layers),
        "engine_unroll_i8mxu": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, kv_dtype="int8mxu",
            layer_unroll=model.config.num_decoder_layers),
        "engine_unroll_fused": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, kv_dtype="int8",
            fused_cross=True,
            layer_unroll=model.config.num_decoder_layers),
        "engine_unroll_fused_w8": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, kv_dtype="int8",
            weights_dtype="int8", fused_cross=True,
            layer_unroll=model.config.num_decoder_layers),
        "engine_chunk8": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, chunk_size=8),
        "engine_scores": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, collect_cross_scores=True),
        "engine_unroll": lambda: make_engine_generate_fn(
            model, max_length=args.max_length,
            layer_unroll=model.config.num_decoder_layers),
        "engine_unroll4": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, layer_unroll=4),
        "engine_unroll_int8": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, kv_dtype="int8",
            layer_unroll=model.config.num_decoder_layers),
        "engine_unroll_sd": lambda: make_engine_generate_fn(
            model, max_length=args.max_length,
            layer_unroll=model.config.num_decoder_layers,
            self_cache_layout="sd"),
        "engine_unroll_sd_int8": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, kv_dtype="int8",
            layer_unroll=model.config.num_decoder_layers,
            self_cache_layout="sd"),
        "engine_unroll_chunk8": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, chunk_size=8,
            layer_unroll=model.config.num_decoder_layers),
        "engine_unroll_chunk16": lambda: make_engine_generate_fn(
            model, max_length=args.max_length, chunk_size=16,
            layer_unroll=model.config.num_decoder_layers),
        "flax_scores": lambda: make_generate_fn(
            model, max_length=args.max_length, collect_cross_scores=True),
    }
    results = {}
    for name in args.variants.split(","):
        name = name.strip()
        if not name:
            continue
        print(f"[bench_decode] compiling {name} (can take 60-300s)...",
              flush=True)
        fn = make[name]()
        t = bench_one(name, fn, (params, ids, mask))
        results[name] = {
            "seconds_per_batch": round(t, 4),
            "answers_per_sec": round(B / t, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"config": {"size": size, "B": B, "N": N, "L": L,
                                 "max_length": args.max_length},
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
