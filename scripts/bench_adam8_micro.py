"""Isolated 8-bit-Adam kernel microbench (VERDICT r4 #4).

Times, at a t5-large-scale leaf (46M elements, blocked (179688, 256)):

- pure Pallas copy (the HBM floor for this tile pattern)
- XLA bf16-moment Adam update (the segment the kernel must approach)
- fused_adam8_update (the kernel under test)
- fused_adam8_update without stochastic rounding (dither cost)

Chained calls (outputs feed the next call's inputs) with one scalar fence
at the end, per the repo's tunneled-TPU benchmark hygiene. Output:
artifacts/adam8_micro.json. Run on TPU: python scripts/bench_adam8_micro.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from lako_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from lako_tpu.ops.adam8_kernel import fused_adam8_update

    NB, C = 179_688, 256            # ~46M elements
    n_el = NB * C
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(NB, C)) * 1e-3, jnp.bfloat16)
    mq = jnp.asarray(rng.integers(-127, 128, (NB, C)), jnp.int8)
    ms = jnp.asarray(np.abs(rng.normal(size=(NB, 1))) * 1e-3, jnp.float32)
    vq = jnp.asarray(rng.integers(0, 255, (NB, C)), jnp.uint8)
    vs = jnp.asarray(np.abs(rng.normal(size=(NB, 1))) * 1e-6, jnp.float32)
    cnt = jnp.asarray(3, jnp.int32)

    out = {"elements": n_el, "shape": [NB, C]}
    ITERS = 16

    def timed(label, fn, fence):
        o = fn()            # compile + warm
        fence(o)
        t0 = time.perf_counter()
        o = fn()
        for _ in range(ITERS - 1):
            o = fn(o)
        fence(o)
        ms_per = (time.perf_counter() - t0) / ITERS * 1e3
        out[label] = round(ms_per, 3)
        print(f"{label}: {ms_per:.3f} ms / {n_el/1e6:.0f}M elements",
              flush=True)

    # 1) pure copy floor (read+write one byte-per-element pair like the
    #    moment stream, plus the f32 u output)
    def copy_kernel(src_ref, dst_ref):
        dst_ref[...] = src_ref[...]

    @jax.jit
    def pure_copy(x):
        return pl.pallas_call(
            copy_kernel, grid=(-(-NB // 256),),
            in_specs=[pl.BlockSpec((256, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((256, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, C), x.dtype),
        )(x)

    timed("pallas_copy_int8_ms", lambda o=None: pure_copy(mq if o is None else o),
          lambda o: float(jnp.sum(o[:1].astype(jnp.float32))))

    # 2) XLA bf16-moment Adam (both moments bf16, classic update)
    m0 = jnp.zeros((NB, C), jnp.bfloat16)
    v0 = jnp.zeros((NB, C), jnp.bfloat16)

    @jax.jit
    def xla_bf16_update(m, v):
        gf = g.astype(jnp.float32)
        mf = 0.9 * m.astype(jnp.float32) + 0.1 * gf
        vf = 0.999 * v.astype(jnp.float32) + 0.001 * gf * gf
        u = mf / (jnp.sqrt(vf) + 1e-6)
        return mf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16), \
            u.astype(jnp.bfloat16)

    timed("xla_bf16_adam_ms",
          lambda o=None: xla_bf16_update(*(o[:2] if o else (m0, v0))),
          lambda o: float(jnp.sum(o[2][:1].astype(jnp.float32))))

    # 3) fused kernel, with and without stochastic rounding
    for sr, label in ((True, "fused_kernel_ms"),
                      (False, "fused_kernel_no_dither_ms")):
        step = jax.jit(lambda mq, ms, vq, vs, sr=sr: fused_adam8_update(
            g, mq, ms, vq, vs, cnt, b1=0.9, b2=0.999, eps=1e-6,
            correct_bias=False, stochastic_round=sr, seed=7, leaf_salt=0))
        timed(label,
              lambda o=None: step(mq, ms, vq, vs) if o is None
              else step(o[1], o[2], o[3], o[4]),
              lambda o: float(jnp.sum(o[4][:8])))

    out["bandwidth_floor_note"] = (
        "per call the fused kernel moves ~2 B/el of codes (r+w), 2 B/el "
        "bf16 g in + u out, + scales: ~6 B/el = ~0.34 ms at 819 GB/s for "
        "46M elements")
    print(json.dumps(out, indent=1))
    pathlib.Path("artifacts").mkdir(exist_ok=True)
    pathlib.Path("artifacts/adam8_micro.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
