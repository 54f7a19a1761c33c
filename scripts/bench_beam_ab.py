"""In-engine A/B of the BeamEngine self-attention formulations at the
reference eval config (t5-large, B=128, beams=4, N=2, L=130, max_length=50).

scripts/bench_beam_parts.py measured the isolated cores (r3): allslots
0.357 ms vs gather-first 0.101 ms vs flat 0.177 ms per layer-step — but the
micro numbers flatter whatever fits VMEM as a loop invariant, so the engine
A/B on the real chip is what decides the default.

Usage: python scripts/bench_beam_ab.py [--impls allslots,gather]

An impl entry may carry a select variant as ``impl+select``, e.g.
``packed+blockwise`` (select defaults to plain topk so older rows stay
comparable).
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="allslots,gather")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--beams", type=int, default=4)
    ap.add_argument("--max-length", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lako_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from lako_tpu.core.config import t5_config_for_size
    from lako_tpu.models.t5 import FiDT5
    from lako_tpu.models.t5.beam_engine import BeamEngine

    cfg = t5_config_for_size("large", dropout_rate=0.0)
    model = FiDT5(cfg, dtype=jnp.bfloat16, use_remat=False)
    B, N, L = args.batch, 2, 130
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (B, N, L), 0, cfg.vocab_size,
                             dtype=jnp.int32)
    mask = jnp.ones((B, N, L), dtype=bool)
    labels = jnp.zeros((B, 8), jnp.int32)
    params = jax.jit(lambda r: model.init(r, ids, mask, labels)["params"])(rng)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    out = {}
    ref_tokens = None
    for impl in args.impls.split(","):
        impl, _, select = impl.partition("+")
        eng = BeamEngine(model, max_length=args.max_length,
                         num_beams=args.beams, self_attn_impl=impl,
                         select_impl=select or "topk")
        impl = f"{impl}+{select}" if select else impl
        toks = eng.generate(params, ids, mask)
        t_np = np.asarray(toks)
        mism = None
        if ref_tokens is None:
            ref_tokens = t_np
        else:
            mism = int((t_np != ref_tokens).sum())
            rows = int((t_np != ref_tokens).any(axis=1).sum())
            print(f"[beam_ab] {impl}: token mismatches vs first impl: "
                  f"{mism}/{t_np.size} ({rows}/{t_np.shape[0]} rows) — "
                  f"bf16 rounding-point flips at near-ties", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            toks = eng.generate(params, ids, mask)
            _ = int(np.asarray(toks).sum())
            times.append(time.perf_counter() - t0)
        best = min(times[1:])
        out[impl] = {"s_per_batch": round(best, 3),
                     "ans_per_sec": round(B / best, 1)}
        print(f"[beam_ab] {impl}: {['%.3f' % t for t in times]} "
              f"best={best:.3f}s  {B/best:.1f} ans/s", flush=True)
        del eng

    print(json.dumps(out))
    art = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    art.mkdir(exist_ok=True)
    (art / "beam_ab.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
