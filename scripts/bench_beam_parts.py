"""Per-component timing of one BeamEngine layer step at the reference beam
config (t5-large, B=128, beams=4, S=49, Ke=260) on the real chip.

The beam engine's step-cost decomposition (beam_engine.py docstring /
commit 045d6e4) says 1.24 ms/layer/step vs a ~0.6 ms byte floor, with the
gap attributed to small-GEMM/VPU overhead at M=B*K. This script breaks a
layer into its constituent ops and times each in isolation to find which
op(s) own the gap, plus variants of the self-attention logits/context
einsums to test cheaper formulations.

Each op is timed INSIDE one jit via lax.scan chaining (output feeds next
input) so the ~72 ms/dispatch tunnel overhead is paid once per op, not per
iteration.

Usage: python scripts/bench_beam_parts.py [--iters 200]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

B, K, h, d, H, S, Ke, V, DFF = 128, 4, 16, 64, 1024, 49, 260, 32128, 4096
HBM_GBPS = 819.0  # v5e


_BASELINE_MS = [0.0]  # per-iter dispatch+loop residue, set by calibration


def timed(name, fn, args, iters, bytes_moved=None, is_baseline=False):
    """Time `iters` chained applications of fn inside one jit.

    The ~64 ms tunnel dispatch per loop() CALL plus while-loop overhead is
    measured by a near-empty calibration body and subtracted; unroll=10
    amortizes per-while-iteration cost."""
    import jax

    @jax.jit
    def loop(*xs):
        def body(carry, _):
            out = fn(*carry)
            return out, None
        out, _ = jax.lax.scan(body, xs, None, length=iters, unroll=10)
        return out

    out = loop(*args)
    _ = [np.asarray(o).ravel()[:1] for o in jax.tree_util.tree_leaves(out)]
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(*args)
        _ = [np.asarray(o).ravel()[:1] for o in jax.tree_util.tree_leaves(out)]
        times.append(time.perf_counter() - t0)
    raw = min(times[1:]) / iters * 1e3
    ms = raw if is_baseline else max(raw - _BASELINE_MS[0], 0.0)
    if is_baseline:
        _BASELINE_MS[0] = raw
    floor = ""
    if bytes_moved is not None:
        floor = f"  floor={bytes_moved / HBM_GBPS / 1e6:.3f} ms ({bytes_moved / 1e6:.0f} MB)"
    print(f"[beam_parts] {name:34s} {ms:7.3f} ms/iter{floor}", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lako_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.normal(size=s, scale=0.02), jnp.bfloat16)

    x = f(B * K, H)
    wqkv = f(H, 3 * h * d)
    wo = f(h * d, H)
    wi = f(H, DFF)
    wo_m = f(DFF, H)
    ln = jnp.ones((H,), jnp.float32)
    sk = f(B, h, d, K, S)
    sv = f(B, h, d, K, S)
    ck = f(B, h, d, Ke)
    cv = f(B, h, d, Ke)
    q4 = f(B, K, h, d)
    probs4 = f(B, K, h, S)
    anc = jnp.asarray(rng.integers(0, K, size=(B, K, S)), jnp.int32)
    onehot = (anc[:, :, None, :] == np.arange(K)[None, None, :, None]
              ).astype(jnp.float32)
    onehot_bf = onehot.astype(jnp.bfloat16)
    lm = f(H, V)
    emb = f(V, H)
    tok = jnp.asarray(rng.integers(0, V, size=(B, K)), jnp.int32)
    scores = jnp.zeros((B, K), jnp.float32)

    it = args.iters
    results = {}

    # --- calibration: near-empty body → residual loop overhead per iter
    results["loop_overhead"] = timed(
        "loop overhead (x+1e-6)", lambda a: (a + 1e-6,), (x,), it,
        is_baseline=True)

    # --- GEMMs (weights re-read each iter; stream bytes = weight + act)
    results["qkv_gemm"] = timed(
        "qkv GEMM (512,1024)x(1024,3072)",
        lambda a: (jnp.dot(a, wqkv).reshape(B * K, 3 * h * d)[:, :H],),
        (x,), it, bytes_moved=2 * (H * 3 * h * d + B * K * (H + 3 * h * d)))
    results["mlp_gemms"] = timed(
        "MLP up+relu+down",
        lambda a: (jnp.dot(jax.nn.relu(jnp.dot(a, wi)), wo_m),),
        (x,), it, bytes_moved=2 * (H * DFF * 2 + B * K * (2 * H + 2 * DFF)))
    results["out_gemm"] = timed(
        "attn out GEMM (512,1024)x(1024,1024)",
        lambda a: (jnp.dot(a, wo),),
        (x,), it, bytes_moved=2 * (H * H + 2 * B * K * H))

    # --- self-attention core, current formulation
    def self_attn_current(q):
        logits_all = jnp.einsum("bqhd,bhdcs->bqchs", q, sk
                                ).astype(jnp.float32)
        logits = jnp.sum(logits_all * onehot[:, :, :, None, :], axis=2)
        probs = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        pw = probs[:, :, None] * onehot_bf[:, :, :, None, :]
        out = jnp.einsum("bqchs,bhdcs->bqhd", pw, sv)
        return (out.reshape(B, K, h, d) * 1e-3 + q,)

    cache_bytes = 2 * B * h * d * K * S * 2
    results["self_attn_current"] = timed(
        "self-attn core (all-slots+onehot)", self_attn_current, (q4,), it,
        bytes_moved=cache_bytes)

    # --- variant: gather keys/values first (materializes (B,K,h,d,S))
    def self_attn_gather(q):
        # one-hot gather of k/v rows along the slot axis
        ksel = jnp.einsum("bqcs,bhdcs->bqhds", onehot_bf, sk)
        vsel = jnp.einsum("bqcs,bhdcs->bqhds", onehot_bf, sv)
        logits = jnp.einsum("bqhd,bqhds->bqhs", q, ksel).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        out = jnp.einsum("bqhs,bqhds->bqhd", probs, vsel)
        return (out * 1e-3 + q,)

    results["self_attn_gather"] = timed(
        "self-attn gather-first", self_attn_gather, (q4,), it,
        bytes_moved=cache_bytes + 2 * 2 * B * K * h * d * S * 2)

    # --- variant: flatten (c,s) into one free axis M=K*S
    sk_flat = sk.reshape(B, h, d, K * S)
    sv_flat = sv.reshape(B, h, d, K * S)
    onehot_flat = onehot.reshape(B, K, K * S)
    onehot_flat_bf = onehot_bf.reshape(B, K, K * S)

    def self_attn_flat(q):
        logits_all = jnp.einsum("bqhd,bhdm->bqhm", q, sk_flat
                                ).astype(jnp.float32)
        # select + reduce the slot axis: (B,K,h,K*S)*(B,K,1,K*S) -> (B,K,h,S)
        logits = (logits_all * onehot_flat[:, :, None, :]).reshape(
            B, K, h, K, S).sum(axis=3)
        probs = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        pw = (probs[:, :, :, None, :] * onehot_flat_bf.reshape(
            B, K, 1, K, S)).reshape(B, K, h, K * S)
        out = jnp.einsum("bqhm,bhdm->bqhd", pw, sv_flat)
        return (out * 1e-3 + q,)

    results["self_attn_flat"] = timed(
        "self-attn flat M=K*S", self_attn_flat, (q4,), it,
        bytes_moved=cache_bytes)

    # --- cross-attention core
    def cross_attn(q):
        cl = jnp.einsum("bqhd,bhdk->bqhk", q, ck).astype(jnp.float32)
        cp = jax.nn.softmax(cl, axis=-1).astype(jnp.bfloat16)
        co = jnp.einsum("bqhk,bhdk->bqhd", cp, cv)
        return (co * 1e-3 + q,)

    results["cross_attn"] = timed(
        "cross-attn core (Ke=260)", cross_attn, (q4,), it,
        bytes_moved=2 * B * h * d * Ke * 2)

    # --- rms norm x3
    def rms3(a):
        from lako_tpu.models.t5.engine import _rms
        y = _rms(a, ln, 1e-6, jnp.bfloat16)
        y = _rms(y, ln, 1e-6, jnp.bfloat16)
        y = _rms(y, ln, 1e-6, jnp.bfloat16)
        return (y + a * 1e-3,)

    results["rms_x3"] = timed("rms norm x3", rms3, (x,),
                              it, bytes_moved=6 * B * K * H * 2)

    # --- cache column write (per step, all layers: here 1 layer slice)
    def cache_write(kc):
        nk = jax.lax.dynamic_update_slice(
            sk[:, None], kc.astype(sk.dtype).transpose(0, 2, 3, 1)[:, None, ..., None],
            (0, 0, 0, 0, 0, 5))
        return (nk[:, 0, :, :, :, 5].transpose(0, 3, 1, 2) + kc * 1e-3,)

    results["cache_write"] = timed("cache col write (1 layer)", cache_write,
                                   (q4,), it)

    # --- selection block: logits tail + log_softmax + topk + banking
    def selection(sc, q):
        logits = jnp.dot(q.reshape(B * K, h * d), lm).reshape(B, K, V)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = sc[:, :, None] + logp
        top_scores, top_idx = jax.lax.top_k(cand.reshape(B, K * V), 2 * K)
        src = top_idx // V
        nsc = jnp.take_along_axis(top_scores, jnp.argsort(src, axis=1)[:, :K],
                                  axis=1)
        return (nsc * 1e-3 + sc, q + nsc[:, :, None, None].astype(q.dtype) * 1e-6)

    results["selection_full"] = timed(
        "lm head+log_softmax+topk(K*V)", selection, (scores, q4), it,
        bytes_moved=2 * H * V + 4 * B * K * V * 2)

    # --- selection variant: two-stage topk (per-beam then merge)
    def selection_2stage(sc, q):
        logits = jnp.dot(q.reshape(B * K, h * d), lm).reshape(B, K, V)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = sc[:, :, None] + logp
        ts1, ti1 = jax.lax.top_k(cand.reshape(B * K, V), 2 * K)
        ts1 = ts1.reshape(B, K * 2 * K)
        ti1 = ti1.reshape(B, K * 2 * K)
        top_scores, pos = jax.lax.top_k(ts1, 2 * K)
        top_idx = jnp.take_along_axis(ti1, pos, axis=1) + (pos // (2 * K)) * V
        src = top_idx // V
        nsc = jnp.take_along_axis(top_scores, jnp.argsort(src, axis=1)[:, :K],
                                  axis=1)
        return (nsc * 1e-3 + sc, q + nsc[:, :, None, None].astype(q.dtype) * 1e-6)

    results["selection_2stage"] = timed(
        "lm head+log_softmax+2-stage topk", selection_2stage, (scores, q4), it,
        bytes_moved=2 * H * V + 4 * B * K * V * 2)

    # --- lm head GEMM alone
    results["lm_head"] = timed(
        "lm head GEMM (512,1024)x(1024,32128)",
        lambda a: (jnp.dot(a, lm)[:, :H],), (x,), it,
        bytes_moved=2 * (H * V + B * K * (H + V)))

    # --- embedding take
    def embed(t):
        from lako_tpu.models.t5.engine import _take_embedding
        e = _take_embedding(emb, t, jnp.bfloat16)
        return ((t + 1) % V,)

    results["embedding"] = timed("embedding take", embed, (tok,), it)

    out = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / "beam_parts.json"
    out.write_text(json.dumps({k: round(v, 4) for k, v in results.items()},
                              indent=1))
    layer_sum = (results["qkv_gemm"] + results["self_attn_current"]
                 + results["cross_attn"] + results["mlp_gemms"]
                 + 2 * results["out_gemm"] + results["rms_x3"])
    print(f"[beam_parts] layer sum (current parts) ~ {layer_sum:.3f} ms "
          f"vs measured 1.24 ms/layer", flush=True)
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
