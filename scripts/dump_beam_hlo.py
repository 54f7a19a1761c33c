"""Dump the optimized HLO of the beam/greedy decode step and report:
- buffer layouts chosen for the KV caches (tile padding!)
- copies/transposes living INSIDE the decode loop (per-step cost)

Uses a reduced layer count (layout/fusion decisions are per-op, not
per-depth) so the AOT compile stays fast. No execution.

Usage: python scripts/dump_beam_hlo.py [--mode beam|greedy] [--layers 4]
"""

import argparse
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="beam", choices=["beam", "greedy"])
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--full", action="store_true",
                    help="write full HLO text to /tmp")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lako_tpu.core.config import T5Config
    from lako_tpu.models.t5.model import FiDT5

    cfg = T5Config(vocab_size=32128, d_model=1024, d_kv=64, d_ff=4096,
                   num_layers=2, num_decoder_layers=args.layers,
                   num_heads=16, dropout_rate=0.0)
    model = FiDT5(cfg, dtype=jnp.bfloat16)
    B, N, L = args.b, 2, 130
    ids = jnp.zeros((B, N, L), jnp.int32)
    mask = jnp.ones((B, N, L), bool)
    labels = jnp.zeros((B, 4), jnp.int32)
    params = jax.eval_shape(
        lambda r: model.init(r, ids, mask, labels)["params"],
        jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16), params)

    if args.mode == "beam":
        from lako_tpu.models.t5.beam_engine import BeamEngine
        eng = BeamEngine(model, max_length=args.steps, num_beams=4,
                         select_impl="topk")
        lowered = jax.jit(eng._generate_impl).lower(params, ids, mask)
    else:
        from lako_tpu.models.t5.engine import DecodeEngine
        eng = DecodeEngine(model, max_length=args.steps)
        lowered = jax.jit(eng._generate_impl).lower(params, ids, mask)

    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.full:
        p = f"/tmp/{args.mode}_hlo.txt"
        pathlib.Path(p).write_text(txt)
        print(f"full HLO -> {p}  ({len(txt)} bytes)")

    # --- big buffers and their layouts
    print("\n=== large bf16/f32 buffer shapes with layouts (>=50 MB) ===")
    seen = set()
    for m in re.finditer(r"(bf16|f32|s8)\[([0-9,]+)\]\{([0-9,]+)[^}]*\}",
                         txt):
        dt, dims, layout = m.group(1), m.group(2), m.group(3)
        shape = [int(x) for x in dims.split(",")]
        n = 1
        for s in shape:
            n *= s
        bytes_ = n * (2 if dt == "bf16" else 4 if dt == "f32" else 1)
        if bytes_ >= 50e6:
            key = (dt, dims, layout)
            if key not in seen:
                seen.add(key)
                full = m.group(0)
                print(f"  {full}   {bytes_/1e6:.0f} MB logical")

    # --- while-loop bodies: copies / transposes of big operands
    print("\n=== copy/transpose/dus ops on >=50 MB operands ===")
    for line in txt.splitlines():
        ls = line.strip()
        if not re.search(r"= *(bf16|f32)\[", ls):
            continue
        if ("copy(" in ls or "transpose(" in ls
                or "dynamic-update-slice(" in ls or "copy-start" in ls):
            m = re.search(r"(bf16|f32)\[([0-9,]+)\]", ls)
            if not m:
                continue
            shape = [int(x) for x in m.group(2).split(",")]
            n = 1
            for s in shape:
                n *= s
            bytes_ = n * (2 if m.group(1) == "bf16" else 4)
            if bytes_ >= 50e6:
                print(f"  [{bytes_/1e6:.0f} MB] {ls[:240]}")

    # --- per-buffer allocation stats if available
    try:
        mem = compiled.memory_analysis()
        print(f"\n=== memory analysis ===\n  {mem}")
    except Exception as e:  # noqa
        print(f"(memory_analysis unavailable: {e})")


if __name__ == "__main__":
    main()
