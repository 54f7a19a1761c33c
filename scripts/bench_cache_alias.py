"""Does a dynamic-update-slice on a lax.scan carry alias in place?

The beam engine writes one (l,B,h,d,K,1) column per step into two
(l,B,h,d,K,S) caches carried through the decode scan. In-situ ablation
(artifacts/beam_ablate.json) shows the write costs 13.7 ms/step — the
arithmetic of a full COPY of both PADDED caches, not of a 4 MB column
write. This isolates the pattern: carry a cache through a scan, read it
(attention-like), write a column, and time the combinations.

Usage: python scripts/bench_cache_alias.py
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

L, B, h, d, K, S = 24, 128, 16, 64, 4, 49
HBM_GBPS = 819.0


def timed(name, make_loop, iters=50, note=""):
    import jax

    loop = jax.jit(make_loop(iters))
    out = loop()
    _ = [np.asarray(o).ravel()[:1] for o in jax.tree_util.tree_leaves(out)]
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop()
        _ = [np.asarray(o).ravel()[:1]
             for o in jax.tree_util.tree_leaves(out)]
        times.append(time.perf_counter() - t0)
    ms = min(times[1:]) / iters * 1e3
    print(f"[alias] {name:44s} {ms:8.3f} ms/iter  {note}", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from lako_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    logical_gb = L * B * h * d * K * S * 2 / 1e9
    print(f"cache logical: {logical_gb:.2f} GB "
          f"(floor read {logical_gb / HBM_GBPS * 1e3:.2f} ms)")

    def col(step):
        return jnp.full((L, B, h, d, K, 1), 1.0, jnp.bfloat16) * (step + 1.0)

    results = {}

    def dus_only(iters):
        def fn():
            cache = jnp.zeros((L, B, h, d, K, S), jnp.bfloat16)

            def body(c, step):
                c = jax.lax.dynamic_update_slice(
                    c, col(step).astype(c.dtype), (0, 0, 0, 0, 0, step))
                return c, None

            c, _ = jax.lax.scan(body, cache,
                                jnp.arange(iters, dtype=jnp.int32) % S)
            return c[0, 0, 0, 0, 0]
        return fn

    results["dus_only"] = timed("DUS column write only", dus_only,
                                note="aliased => ~4 MB/iter")

    def read_only(iters):
        def fn():
            cache = jnp.ones((L, B, h, d, K, S), jnp.bfloat16)

            def body(acc, step):
                r = jnp.einsum("lbhdks->bh", cache).astype(jnp.float32)
                return acc + r, None

            a, _ = jax.lax.scan(body, jnp.zeros((B, h), jnp.float32),
                                jnp.arange(iters, dtype=jnp.int32) % S)
            return a
        return fn

    results["read_only"] = timed("full-cache read (reduce) only", read_only,
                                 note="measures padded read bytes")

    def read_write(iters):
        def fn():
            cache = jnp.zeros((L, B, h, d, K, S), jnp.bfloat16)

            def body(carry, step):
                c, acc = carry
                r = jnp.einsum("lbhdks->bh", c).astype(jnp.float32)
                c = jax.lax.dynamic_update_slice(
                    c, col(step).astype(c.dtype), (0, 0, 0, 0, 0, step))
                return (c, acc + r), None

            (c, a), _ = jax.lax.scan(
                body, (cache, jnp.zeros((B, h), jnp.float32)),
                jnp.arange(iters, dtype=jnp.int32) % S)
            return a + c[0, 0, 0, 0, 0, 0].astype(jnp.float32)
        return fn

    results["read_write"] = timed("read THEN column write (engine pattern)",
                                  read_write,
                                  note="alias ok => read+4MB; copy => +2x")

    # S-major layout: the step axis leading — the written slab is the
    # most-major slice (contiguous), reads unchanged logically
    def read_write_smajor(iters):
        def fn():
            cache = jnp.zeros((S, L, B, h, d, K), jnp.bfloat16)

            def body(carry, step):
                c, acc = carry
                r = jnp.einsum("slbhdk->bh", c).astype(jnp.float32)
                up = jnp.full((1, L, B, h, d, K), 1.0, jnp.bfloat16)
                c = jax.lax.dynamic_update_slice(
                    c, up, (step, 0, 0, 0, 0, 0))
                return (c, acc + r), None

            (c, a), _ = jax.lax.scan(
                body, (cache, jnp.zeros((B, h), jnp.float32)),
                jnp.arange(iters, dtype=jnp.int32) % S)
            return a + c[0, 0, 0, 0, 0, 0].astype(jnp.float32)
        return fn

    results["read_write_smajor"] = timed(
        "read THEN slab write, S-major layout", read_write_smajor)

    # hd-minor layout (l,B,K,S,h*d): lanes 1024, sublanes S=49->56
    def read_write_hdminor(iters):
        def fn():
            cache = jnp.zeros((L, B, K, S, h * d), jnp.bfloat16)

            def body(carry, step):
                c, acc = carry
                r = jnp.einsum("lbksh->bk", c).astype(jnp.float32)
                up = jnp.full((L, B, K, 1, h * d), 1.0, jnp.bfloat16)
                c = jax.lax.dynamic_update_slice(
                    c, up, (0, 0, 0, step, 0))
                return (c, acc + r), None

            (c, a), _ = jax.lax.scan(
                body, (cache, jnp.zeros((B, K), jnp.float32)),
                jnp.arange(iters, dtype=jnp.int32) % S)
            return a + c[0, 0, 0, 0, 0].astype(jnp.float32)
        return fn

    results["read_write_hdminor"] = timed(
        "read THEN row write, (l,B,K,S,hd) layout", read_write_hdminor,
        note="padding 1.14x vs 2.28x")

    out = (pathlib.Path(__file__).resolve().parents[1] / "artifacts"
           / "cache_alias.json")
    out.write_text(json.dumps({k: round(v, 3) for k, v in results.items()},
                              indent=1))
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
