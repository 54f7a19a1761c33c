"""Streamed flash attention vs XLA at L ∈ {130, 512, 1024, 2048} on TPU.

Encoder self-attention shapes (t5-large: H=16, D=64), rows = B·N passages.
Prints a JSON table; the measured crossover feeds T5Config.flash_min_length.
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def bench(fn, args, repeats=6, inner=8):
    """fn must return a SCALAR (on-device reduction): fencing by pulling the
    full (B,H,L,D) output through the tunnel would swamp the kernel time
    (67 MB at L=2048). `inner` chained calls amortize per-dispatch overhead."""
    _ = float(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        acc = 0.0
        for _i in range(inner):
            acc = fn(*args)
        _ = float(acc)  # scalar host transfer fences the chain
        times.append((time.perf_counter() - t0) / inner)
    return min(times[1:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16, help="B*N passages")
    ap.add_argument("--lengths", default="130,512,1024,2048")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lako_tpu.core.cache import enable_compilation_cache
    from lako_tpu.ops.flash_streamed import _xla_reference, streamed_attention

    enable_compilation_cache()

    B, H, D = args.rows, args.heads, args.dim
    results = {}
    for L in [int(x) for x in args.lengths.split(",")]:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
        rel = jnp.asarray(rng.normal(size=(H, L, L)), jnp.float32)
        mask = jnp.ones((B, L), bool)

        xla = jax.jit(lambda q, k, v, rel, m: _xla_reference(q, k, v, rel, m))
        stream = jax.jit(lambda q, k, v, rel, m: streamed_attention(
            q, k, v, rel, m, 512, 1024, False))
        xla_s = jax.jit(lambda q, k, v, rel, m: jnp.sum(
            _xla_reference(q, k, v, rel, m).astype(jnp.float32)))
        stream_s = jax.jit(lambda q, k, v, rel, m: jnp.sum(
            streamed_attention(q, k, v, rel, m, 512, 1024,
                               False).astype(jnp.float32)))

        print(f"[bench_flash] L={L}: compiling XLA...", flush=True)
        t_x = bench(xla_s, (q, k, v, rel, mask))
        print(f"[bench_flash] L={L}: XLA {t_x*1e3:.2f} ms; compiling "
              f"streamed...", flush=True)
        t_s = bench(stream_s, (q, k, v, rel, mask))
        # numerics sanity on device
        dx = np.asarray(xla(q, k, v, rel, mask), np.float32)
        ds = np.asarray(stream(q, k, v, rel, mask), np.float32)
        err = float(np.max(np.abs(dx - ds)))
        results[L] = {"xla_ms": round(t_x * 1e3, 2),
                      "streamed_ms": round(t_s * 1e3, 2),
                      "speedup": round(t_x / t_s, 2),
                      "max_abs_err": err}
        print(json.dumps({L: results[L]}), flush=True)
    print(json.dumps({"rows": B, "heads": H, "dim": D, "results": results}),
          flush=True)


if __name__ == "__main__":
    main()
