"""Day-one rehearsal of real-weights import at the real size (VERDICT r3 #8).

No pretrained checkpoints exist in this environment (zero egress), so the
import path (models/hf_io.py → models/t5/convert.py) has only been
parity-tested at toy shapes. This script rehearses the full day-one flow at
t5-LARGE scale so the EM-parity run is a one-command job when real weights
appear:

1. writes a genuine HF ``save_pretrained`` t5-large checkpoint to disk
   (randomly initialized transformers T5ForConditionalGeneration —
   authentic config.json + safetensors layout, the exact format
   ``from_pretrained`` consumes in the reference, train_reader.py:243-250);
2. imports it through ``load_hf_t5`` (the CLI --model-path warm-start path);
3. CPU numeric parity at the full size: our FiDT5 forward logits vs the
   torch model on the same inputs (extends tests/test_t5_parity.py beyond
   toy shapes);
4. on the accelerator: donated train step at the reference config
   (B=8, N=2, L=130, bf16) — two steps, finite loss, HBM footprint — and a
   greedy decode through the production engine.

Output: artifacts/t5_large_import_rehearsal.json
Run: python scripts/rehearse_t5_large_import.py [--workdir /tmp/t5l]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/t5_large_rehearsal")
    ap.add_argument("--size", default="large")
    ap.add_argument("--skip-parity", action="store_true",
                    help="skip the CPU torch-vs-flax logits check")
    ap.add_argument("--out", default="artifacts/t5_large_import_rehearsal.json")
    args = ap.parse_args()

    out = {"size": args.size}
    wd = Path(args.workdir)
    ckpt_dir = wd / f"t5-{args.size}-synthetic"

    # ---- 1. authentic save_pretrained checkpoint ---------------------------
    t0 = time.time()
    if not (ckpt_dir / "config.json").exists():
        import torch
        from transformers import T5Config as HFT5Config
        from transformers import T5ForConditionalGeneration

        presets = {
            "large": dict(d_model=1024, d_kv=64, d_ff=4096, num_layers=24,
                          num_heads=16),
            "base": dict(d_model=768, d_kv=64, d_ff=3072, num_layers=12,
                         num_heads=12),
        }
        hf_cfg = HFT5Config(vocab_size=32128, dropout_rate=0.0,
                            feed_forward_proj="relu",
                            decoder_start_token_id=0, pad_token_id=0,
                            **presets[args.size])
        torch.manual_seed(0)
        model = T5ForConditionalGeneration(hf_cfg)
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        # max_shard_size below the model size exercises the SHARDED
        # safetensors path (index + multiple files), which real t5-large
        # hub checkpoints use
        model.save_pretrained(str(ckpt_dir), safe_serialization=True,
                              max_shard_size="1GB")
        del model
    out["write_checkpoint_s"] = round(time.time() - t0, 1)
    files = sorted(p.name for p in ckpt_dir.iterdir())
    out["checkpoint_files"] = files
    out["checkpoint_bytes"] = sum(p.stat().st_size
                                  for p in ckpt_dir.iterdir())

    # ---- 2. import through the production path -----------------------------
    from lako_tpu.models.hf_io import is_hf_checkpoint_dir, load_hf_t5

    assert is_hf_checkpoint_dir(str(ckpt_dir))
    t0 = time.time()
    t5_cfg, params = load_hf_t5(str(ckpt_dir))
    out["import_s"] = round(time.time() - t0, 1)
    import jax
    import jax.numpy as jnp
    import numpy as np

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    out["imported_params"] = n_params
    out["t5_config"] = {"d_model": t5_cfg.d_model, "layers": t5_cfg.num_layers,
                        "heads": t5_cfg.num_heads, "d_ff": t5_cfg.d_ff}
    print(json.dumps(out), flush=True)

    # ---- 3. CPU numeric parity at full size ---------------------------------
    if not args.skip_parity:
        import torch
        from transformers import T5ForConditionalGeneration

        from lako_tpu.models.t5 import FiDT5

        tmodel = T5ForConditionalGeneration.from_pretrained(str(ckpt_dir))
        tmodel.eval()
        # real hub t5 checkpoints carry decoder_start_token_id=pad=0 in
        # config.json; a synthetic HFT5Config() default omits it
        if tmodel.config.decoder_start_token_id is None:
            tmodel.config.decoder_start_token_id = 0
            tmodel.config.pad_token_id = 0
        # N=1: plain torch T5 attends over the whole flat sequence, FiD
        # encodes passages independently — they only compute the same
        # function with a single passage (tests/test_t5_parity.py does the
        # N>1 FiD-reshape parity at toy size)
        B, N, L, T = 1, 1, 32, 4
        rng = np.random.default_rng(0)
        ids = rng.integers(10, 1000, size=(B, N, L)).astype(np.int32)
        labels = rng.integers(10, 1000, size=(B, T)).astype(np.int32)
        with torch.no_grad():
            tout = tmodel(
                input_ids=torch.tensor(ids.reshape(B, N * L), dtype=torch.long),
                attention_mask=torch.ones(B, N * L, dtype=torch.long),
                labels=torch.tensor(labels, dtype=torch.long))
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            fmodel = FiDT5(t5_cfg, dtype=jnp.float32)
            loss, logits, _ = fmodel.apply(
                {"params": params}, jnp.asarray(ids),
                jnp.ones((B, N, L), bool), jnp.asarray(labels))
            diff = float(np.max(np.abs(np.asarray(logits)
                                       - tout.logits.numpy())))
        out["cpu_parity"] = {
            "max_abs_logit_diff": diff,
            "torch_loss": float(tout.loss),
            "flax_loss": float(loss),
        }
        assert diff < 2e-2, f"logit mismatch at t5-{args.size}: {diff}"
        del tmodel
        print(json.dumps(out["cpu_parity"]), flush=True)

    # ---- 4. on-chip donated train step + engine decode ----------------------
    from lako_tpu.core.config import OptimConfig
    from lako_tpu.models.t5 import FiDT5
    from lako_tpu.models.t5.decode import make_best_generate_fn
    from lako_tpu.train.optim import make_optimizer
    from lako_tpu.train.state import TrainState

    from lako_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    out["device"] = str(dev)
    # self-describing artifact (advisor r4 #4): record the state-dtype policy
    # and whether the CPU-parity leg ran, so a re-run can't silently drop the
    # disclosures that were hand-added to the r4 artifact.
    out["dtype_policy"] = ("f32 master params + bf16 compute "
                           "(train/reader.py production policy)")
    out["parity_skipped"] = bool(args.skip_parity)
    model = FiDT5(t5_cfg, dtype=jnp.bfloat16, use_remat=False)
    # production dtype policy (train/reader.py): f32 master params, bf16
    # compute — a pure-bf16 param cast makes warmup-sized AdamW updates
    # (lr 4e-7 at step 1) round away entirely and the loss sits bit-still
    f32 = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x, jnp.float32), dev), params)
    tx = make_optimizer(OptimConfig(optim="adamw", lr=4e-5, weight_decay=0.1,
                                    scheduler="linear", warmup_steps=100,
                                    total_steps=10_000))
    state = TrainState.create(f32, tx)

    @(lambda f: jax.jit(f, donate_argnums=(0,)))
    def step(state, i, m, l):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply({"params": p}, i, m, l)[0])(state.params)
        return state.apply_gradients(grads), loss

    B, N, L, T = 8, 2, 130, 20
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (B, N, L), 0, t5_cfg.vocab_size, jnp.int32)
    mask = jnp.ones((B, N, L), bool)
    labels = jax.random.randint(rng, (B, T), 0, t5_cfg.vocab_size, jnp.int32)
    t0 = time.time()
    state, loss = step(state, ids, mask, labels)
    l0 = float(loss)
    out["first_step_s"] = round(time.time() - t0, 1)
    state, loss = step(state, ids, mask, labels)
    l1 = float(loss)
    state, loss = step(state, ids, mask, labels)
    l2 = float(loss)
    out["train_losses"] = [l0, l1, l2]
    assert np.isfinite(l0) and np.isfinite(l1) and np.isfinite(l2)
    # same batch each step -> the f32 master params must actually move
    assert l2 != l0, "params did not update across train steps"
    try:
        ms = dev.memory_stats()
        out["hbm_bytes_in_use"] = int(ms.get("bytes_in_use", -1))
        out["hbm_peak_bytes"] = int(ms.get("peak_bytes_in_use", -1))
    except Exception:   # noqa: BLE001 — CPU backends lack memory_stats
        pass
    eval_params = state.params
    gen = make_best_generate_fn(model, max_length=50)
    t0 = time.time()
    tokens, _ = gen(eval_params, ids, mask)
    tokens.block_until_ready()
    out["decode_compile_plus_first_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    tokens, _ = gen(eval_params, ids, mask)
    tokens.block_until_ready()
    out["decode_steady_s"] = round(time.time() - t0, 2)
    out["decoded_shape"] = list(np.asarray(tokens).shape)

    print(json.dumps(out, indent=1))
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
