"""In-situ ablation of the BeamEngine step at the reference eval config.

scripts/bench_beam_parts.py timed each op in ISOLATION and their sum
(~0.64 ms/layer) explains only half the measured 1.24 ms/layer — the gap
lives in composition (layouts XLA picks inside the full program, cache
aliasing, fusion boundaries), which isolated parts cannot see. This script
measures each component's cost IN PLACE by deleting it from the real
engine program and timing the full generate delta:

    cost_in_situ(X) = t(full) - t(full minus X)

Every ablation keeps shapes and data dependencies intact (outputs still
feed the same consumers) so XLA cannot dead-code-eliminate neighbours.
Numerics are garbage for ablated runs — only time matters.

Usage: python scripts/bench_beam_ablate.py [--b 128] [--beams 4]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _build(b, n, l):
    import jax
    import jax.numpy as jnp

    from lako_tpu.core.config import t5_config_for_size
    from lako_tpu.models.t5 import FiDT5

    cfg = t5_config_for_size("large", dropout_rate=0.0)
    model = FiDT5(cfg, dtype=jnp.bfloat16, use_remat=False)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (b, n, l), 0, cfg.vocab_size,
                             dtype=jnp.int32)
    mask = jnp.ones((b, n, l), dtype=bool)
    labels = jnp.zeros((b, 8), jnp.int32)
    params = jax.jit(lambda r: model.init(r, ids, mask, labels)["params"])(rng)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    return model, cfg, params, ids, mask


def _time(fn, params, ids, mask, reps=3):
    out = fn(params, ids, mask)
    _ = int(np.asarray(out).sum())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(params, ids, mask)
        _ = int(np.asarray(out).sum())
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--beams", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lako_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from lako_tpu.models.t5 import beam_engine as be
    from lako_tpu.models.t5.engine import _mm, _rms, _take_embedding

    model, cfg, params, ids, mask = _build(args.b, 2, 130)
    steps = 49

    results = {}

    def run(name, cls, baseline="full", **kw):
        eng = cls(model, max_length=50, num_beams=args.beams, **kw)
        t = _time(eng.generate, params, ids, mask)
        per_step = t / steps * 1e3
        results[name] = per_step
        delta = results.get(baseline, per_step) - per_step
        print(f"[ablate] {name:28s} {t:7.3f} s/batch  {per_step:6.2f} ms/step"
              f"  in-situ delta vs {baseline} {delta:6.2f} ms", flush=True)
        del eng

    run("full", be.BeamEngine)
    # the full program on the legacy full-width top_k selection path — the
    # baseline for the two selection ablations below, which monkeypatch ops
    # only that path issues (select_impl defaults to blockwise at this
    # vocab, which calls neither the K*V-wide top_k nor jax.nn.log_softmax
    # — against "full" those ablations time an unmodified engine)
    run("full_topk", be.BeamEngine, select_impl="topk")

    # --- no cache write: the per-step (l,B,h,d,K,1) column updates deleted.
    # If the dynamic-update aliases in place this should cost ~bytes of the
    # written columns; if XLA copies the 2x1.23 GB cache, the delta is huge.
    class NoCacheWrite(be.BeamEngine):
        def _one_step(self, sd, tok, caches, ancestry, cross_kv, relpos_rows,
                      cross_bias, step):
            logits, (nsk, nsv) = super()._one_step(
                sd, tok, caches, ancestry, cross_kv, relpos_rows, cross_bias,
                step)
            return logits, caches

    run("no_cache_write", NoCacheWrite)

    # --- selection via per-beam argmax (keeps logp + banking shapes, kills
    # the (B, K*V) top_k). Deterministic fixed src mapping.
    class CheapSelect(be.BeamEngine):
        def _generate_impl(self, params_, input_ids, mask_):
            orig_topk = jax.lax.top_k

            def fake_topk(x, k):
                if x.ndim == 2 and x.shape[-1] == self.num_beams * cfg.vocab_size:
                    B = x.shape[0]
                    K = self.num_beams
                    xr = x.reshape(B, K, cfg.vocab_size)
                    mx = jnp.max(xr, axis=-1)          # (B, K)
                    am = jnp.argmax(xr, axis=-1)       # (B, K)
                    rep = (k + K - 1) // K
                    scores = jnp.tile(mx, (1, rep))[:, :k] - \
                        jnp.arange(k, dtype=x.dtype)[None] * 1e-3
                    idx = (jnp.tile(am + jnp.arange(K)[None] * cfg.vocab_size,
                                    (1, rep))[:, :k]).astype(jnp.int32)
                    return scores, idx
                return orig_topk(x, k)

            jax.lax.top_k = fake_topk
            try:
                return super()._generate_impl(params_, input_ids, mask_)
            finally:
                jax.lax.top_k = orig_topk

    run("argmax_select", CheapSelect, baseline="full_topk",
        select_impl="topk")

    # --- blockwise selection replaced by a shape-correct per-beam max/argmax
    # (keeps the full (B,K,V) logits read + all downstream consumers; deletes
    # the two-stage blockwise machinery incl. its lse). Delta vs "full" is
    # the in-situ cost of the DEFAULT selection path beyond one reduce.
    class CheapBlockwise(be.BeamEngine):
        def _generate_impl(self, params_, input_ids, mask_):
            orig = be.blockwise_top_m

            def fake_blockwise(logits, scores, m, block=251):
                B, K, V = logits.shape
                lmax = jnp.max(logits, axis=-1).astype(jnp.float32)  # (B, K)
                am = jnp.argmax(logits, axis=-1)                     # (B, K)
                cand = scores + lmax
                rep = (m + K - 1) // K
                ts = jnp.tile(cand, (1, rep))[:, :m] - \
                    jnp.arange(m, dtype=jnp.float32)[None] * 1e-3
                idx = (am + jnp.arange(K)[None] * V).astype(jnp.int32)
                return ts, jnp.tile(idx, (1, rep))[:, :m]

            be.blockwise_top_m = fake_blockwise
            try:
                return super()._generate_impl(params_, input_ids, mask_)
            finally:
                be.blockwise_top_m = orig

    run("cheap_select_blockwise", CheapBlockwise)

    # --- no log_softmax on the (B,K,V) logits (raw logits as logp)
    class NoLogSoftmax(be.BeamEngine):
        def _generate_impl(self, params_, input_ids, mask_):
            orig = jax.nn.log_softmax
            jax.nn.log_softmax = lambda x, axis=-1: x
            try:
                return super()._generate_impl(params_, input_ids, mask_)
            finally:
                jax.nn.log_softmax = orig

    run("no_log_softmax", NoLogSoftmax, baseline="full_topk",
        select_impl="topk")

    # --- self-attention reduced to the current-step term (cache read and
    # all-slots einsums deleted; out = p_now-style v_new passthrough)
    class NoSelfAttn(be.BeamEngine):
        def _layer_step(self, x, xs, step, self_pos_bias, cross_bias, onehot):
            cfg_ = self.cfg
            dtype = self.dtype
            h, d = cfg_.num_heads, cfg_.d_kv
            (ln_s, wqkv_s, wo_s, ln_c, wq_c, wo_c, ln_m,
             wi, wi0, wi1, wo_m, sk, sv, ck, cv) = xs
            B, K, H = x.shape
            xn = _rms(x.reshape(B * K, H), ln_s, cfg_.layer_norm_epsilon,
                      dtype)
            qkv = _mm(xn, wqkv_s, dtype).reshape(B, K, 3, h, d)
            q, k_new, v_new = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            out = v_new * jax.nn.sigmoid(
                jnp.sum(q * k_new, axis=-1))[..., None]
            x = x + _mm(out.reshape(B * K, h * d), wo_s, dtype
                        ).reshape(B, K, H)
            # cross attention + mlp identical to parent
            xn = _rms(x.reshape(B * K, H), ln_c, cfg_.layer_norm_epsilon,
                      dtype)
            qc = _mm(xn, wq_c, dtype).reshape(B, K, h, d)
            cl = jnp.einsum("bqhd,bhdk->bqhk", qc, ck).astype(jnp.float32)
            cl = cl + cross_bias
            cp = jax.nn.softmax(cl, axis=-1).astype(dtype)
            co = jnp.einsum("bqhk,bhdk->bqhd", cp, cv)
            x = x + _mm(co.reshape(B * K, h * d), wo_c, dtype
                        ).reshape(B, K, H)
            xn = _rms(x.reshape(B * K, H), ln_m, cfg_.layer_norm_epsilon,
                      dtype)
            if wi is not None:
                act = getattr(jax.nn, cfg_.feed_forward_proj)(
                    _mm(xn, wi, dtype))
            else:
                gact = cfg_.feed_forward_proj.removeprefix("gated-")
                act = getattr(jax.nn, gact)(_mm(xn, wi0, dtype)) \
                    * _mm(xn, wi1, dtype)
            x = x + _mm(act, wo_m, dtype).reshape(B, K, H)
            return x, (k_new, v_new)

    run("no_self_attn", NoSelfAttn)

    # --- cross-attention reduced to identity on q (per-example K/V reads
    # deleted — the dominant HBM stream)
    class NoCrossAttn(be.BeamEngine):
        def _layer_step(self, x, xs, step, self_pos_bias, cross_bias, onehot):
            cfg_ = self.cfg
            dtype = self.dtype
            h, d = cfg_.num_heads, cfg_.d_kv
            (ln_s, wqkv_s, wo_s, ln_c, wq_c, wo_c, ln_m,
             wi, wi0, wi1, wo_m, sk, sv, ck, cv) = xs
            B, K, H = x.shape
            # self attention identical to parent (allslots)
            xn = _rms(x.reshape(B * K, H), ln_s, cfg_.layer_norm_epsilon,
                      dtype)
            qkv = _mm(xn, wqkv_s, dtype).reshape(B, K, 3, h, d)
            q, k_new, v_new = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            S = sk.shape[-1]
            pos = jnp.arange(S)
            logits_all = jnp.einsum("bqhd,bhdcs->bqchs", q, sk
                                    ).astype(jnp.float32)
            logits = jnp.sum(logits_all * onehot[:, :, :, None, :], axis=2)
            logit_now = jnp.sum(q * k_new, axis=-1).astype(jnp.float32)
            logits = jnp.where(pos[None, None, None, :] == step,
                               logit_now[..., None], logits)
            bias = jnp.where(pos[None, :] <= step, self_pos_bias, be.NEG_INF)
            logits = logits + bias[None, None]
            probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
            pw = probs[:, :, None] * onehot[:, :, :, None, :].astype(dtype)
            out = jnp.einsum("bqchs,bhdcs->bqhd", pw, sv)
            p_now = jnp.take_along_axis(
                probs, jnp.full((B, K, h, 1), step, dtype=jnp.int32), axis=-1)
            out = out + p_now * v_new
            x = x + _mm(out.reshape(B * K, h * d), wo_s, dtype
                        ).reshape(B, K, H)
            # cross attn: q passthrough (no K/V read)
            xn = _rms(x.reshape(B * K, H), ln_c, cfg_.layer_norm_epsilon,
                      dtype)
            qc = _mm(xn, wq_c, dtype).reshape(B, K, h, d)
            x = x + _mm(qc.reshape(B * K, h * d), wo_c, dtype
                        ).reshape(B, K, H)
            # mlp identical
            xn = _rms(x.reshape(B * K, H), ln_m, cfg_.layer_norm_epsilon,
                      dtype)
            if wi is not None:
                act = getattr(jax.nn, cfg_.feed_forward_proj)(
                    _mm(xn, wi, dtype))
            else:
                gact = cfg_.feed_forward_proj.removeprefix("gated-")
                act = getattr(jax.nn, gact)(_mm(xn, wi0, dtype)) \
                    * _mm(xn, wi1, dtype)
            x = x + _mm(act, wo_m, dtype).reshape(B, K, H)
            return x, (k_new, v_new)

    run("no_cross_attn", NoCrossAttn)

    full = results["full"]
    topk_base = results.get("full_topk", full)
    print("\n[ablate] in-situ deltas (ms/step):")
    for k, v in results.items():
        base = topk_base if k in ("argmax_select", "no_log_softmax") else full
        if k != "full":
            print(f"  {k:24s} {base - v:7.2f}")

    out_path = args.out or (pathlib.Path(__file__).resolve().parents[1]
                            / "artifacts" / "beam_ablate.json")
    payload = {k: round(v, 3) for k, v in results.items()}
    payload["_baselines"] = {
        "argmax_select": "full_topk", "no_log_softmax": "full_topk",
        "note": ("full runs select_impl=blockwise (the default at this "
                 "vocab); argmax_select/no_log_softmax patch ops only the "
                 "topk path issues, so they ablate full_topk. "
                 "cheap_select_blockwise ablates the default path."),
    }
    pathlib.Path(out_path).write_text(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
