"""KV-cache layout A/B at the reference decode shapes (t5-large, B=128).

Hypothesis from bench_beam_parts.py: the decode attention reads run above
their LOGICAL byte floors because the (8,128) tile pads the minor dims XLA
tiles — e.g. cross-KV (B,h,d,Ke=260) pads 260→384 lanes (1.48x physical
bytes), the beam self-KV (B,h,d,K,S=49) pads its minor pair. If true, a
layout that puts a 128-multiple axis minor (e.g. h*d = 1024) should read at
~1.0x logical bytes — unless per-head access of a 64-lane slice forces
full-tile fetches twice (heads share lane tiles), in which case it won't.
This measures instead of guessing.

Each variant is the attention CORE (logits einsum + softmax + context
einsum) timed via in-jit lax.scan chaining (dispatch paid once), exactly
like scripts/bench_beam_parts.py.

Usage: python scripts/bench_kv_layouts.py [--iters 2000]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

B, K, h, d, H, S, Ke = 128, 4, 16, 64, 1024, 49, 260
HBM_GBPS = 819.0

_BASELINE_MS = [0.0]


def timed(name, fn, args, iters, bytes_moved=None, is_baseline=False):
    import jax

    @jax.jit
    def loop(*xs):
        def body(carry, _):
            return fn(*carry), None
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
        floor = (f"  floor={bytes_moved / HBM_GBPS / 1e6:.3f} ms"
                 f" ({bytes_moved / 1e6:.0f} MB)  ratio="
                 f"{ms / (bytes_moved / HBM_GBPS / 1e6):.2f}x")
    print(f"[kv_layouts] {name:36s} {ms:7.3f} ms/iter{floor}", flush=True)
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

    results = {}
    it = args.iters
    x = f(B * K, H)
    results["loop_overhead"] = timed("loop overhead", lambda a: (a + 1e-6,),
                                     (x,), it, is_baseline=True)

    cross_bytes = 2 * B * h * d * Ke * 2  # K+V bf16, logical

    # ---- cross attention, greedy q (B,h,d) ---------------------------------
    qg = f(B, h, d)

    ck_a, cv_a = f(B, h, d, Ke), f(B, h, d, Ke)

    def cross_cur(q):
        cl = jnp.einsum("bhd,bhdk->bhk", q, ck_a).astype(jnp.float32)
        cp = jax.nn.softmax(cl, axis=-1).astype(jnp.bfloat16)
        co = jnp.einsum("bhk,bhdk->bhd", cp, cv_a)
        return (co * 1e-3 + q,)

    results["greedy_cross_bhdk"] = timed(
        "greedy cross (B,h,d,Ke) current", cross_cur, (qg,), it,
        bytes_moved=cross_bytes)

    ck_b, cv_b = f(B, Ke, h, d), f(B, Ke, h, d)

    def cross_khd(q):
        cl = jnp.einsum("bhd,bkhd->bhk", q, ck_b).astype(jnp.float32)
        cp = jax.nn.softmax(cl, axis=-1).astype(jnp.bfloat16)
        co = jnp.einsum("bhk,bkhd->bhd", cp, cv_b)
        return (co * 1e-3 + q,)

    results["greedy_cross_bkhd"] = timed(
        "greedy cross (B,Ke,h,d) hd-minor", cross_khd, (qg,), it,
        bytes_moved=cross_bytes)

    ck_c, cv_c = f(B, h, Ke, d), f(B, h, Ke, d)

    def cross_hkd(q):
        cl = jnp.einsum("bhd,bhkd->bhk", q, ck_c).astype(jnp.float32)
        cp = jax.nn.softmax(cl, axis=-1).astype(jnp.bfloat16)
        co = jnp.einsum("bhk,bhkd->bhd", cp, cv_c)
        return (co * 1e-3 + q,)

    results["greedy_cross_bhkd"] = timed(
        "greedy cross (B,h,Ke,d) d-minor", cross_hkd, (qg,), it,
        bytes_moved=cross_bytes)

    # padded-to-384 control: same layout as current but Ke already 384 —
    # if current reads at the padded floor, this should cost the SAME
    ck_p, cv_p = f(B, h, d, 384), f(B, h, d, 384)

    def cross_pad(q):
        cl = jnp.einsum("bhd,bhdk->bhk", q, ck_p).astype(jnp.float32)
        cp = jax.nn.softmax(cl, axis=-1).astype(jnp.bfloat16)
        co = jnp.einsum("bhk,bhdk->bhd", cp, cv_p)
        return (co * 1e-3 + q,)

    results["greedy_cross_pad384"] = timed(
        "greedy cross (B,h,d,384) control", cross_pad, (qg,), it,
        bytes_moved=2 * B * h * d * 384 * 2)

    # ---- cross attention, beam q (B,K,h,d) ---------------------------------
    qb = f(B, K, h, d)

    def bcross_cur(q):
        cl = jnp.einsum("bqhd,bhdk->bqhk", q, ck_a).astype(jnp.float32)
        cp = jax.nn.softmax(cl, axis=-1).astype(jnp.bfloat16)
        co = jnp.einsum("bqhk,bhdk->bqhd", cp, cv_a)
        return (co * 1e-3 + q,)

    results["beam_cross_bhdk"] = timed(
        "beam cross (B,h,d,Ke) current", bcross_cur, (qb,), it,
        bytes_moved=cross_bytes)

    def bcross_khd(q):
        cl = jnp.einsum("bqhd,bkhd->bqhk", q, ck_b).astype(jnp.float32)
        cp = jax.nn.softmax(cl, axis=-1).astype(jnp.bfloat16)
        co = jnp.einsum("bqhk,bkhd->bqhd", cp, cv_b)
        return (co * 1e-3 + q,)

    results["beam_cross_bkhd"] = timed(
        "beam cross (B,Ke,h,d) hd-minor", bcross_khd, (qb,), it,
        bytes_moved=cross_bytes)

    # ---- beam self attention (all-slots + one-hot) -------------------------
    anc = jnp.asarray(rng.integers(0, K, size=(B, K, S)), jnp.int32)
    onehot = (anc[:, :, None, :] == np.arange(K)[None, None, :, None]
              ).astype(jnp.float32)
    onehot_bf = onehot.astype(jnp.bfloat16)
    self_bytes = 2 * B * h * d * K * S * 2

    sk_a, sv_a = f(B, h, d, K, S), f(B, h, d, K, S)

    def self_cur(q):
        la = jnp.einsum("bqhd,bhdcs->bqchs", q, sk_a).astype(jnp.float32)
        lg = jnp.sum(la * onehot[:, :, :, None, :], axis=2)
        p = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
        pw = p[:, :, None] * onehot_bf[:, :, :, None, :]
        o = jnp.einsum("bqchs,bhdcs->bqhd", pw, sv_a)
        return (o * 1e-3 + q,)

    results["beam_self_bhdcs"] = timed(
        "beam self (B,h,d,K,S) current", self_cur, (qb,), it,
        bytes_moved=self_bytes)

    sk_b, sv_b = f(B, K, S, h, d), f(B, K, S, h, d)

    def self_cshd(q):
        la = jnp.einsum("bqhd,bcshd->bqchs", q, sk_b).astype(jnp.float32)
        lg = jnp.sum(la * onehot[:, :, :, None, :], axis=2)
        p = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
        pw = p[:, :, None] * onehot_bf[:, :, :, None, :]
        o = jnp.einsum("bqchs,bcshd->bqhd", pw, sv_b)
        return (o * 1e-3 + q,)

    results["beam_self_bcshd"] = timed(
        "beam self (B,K,S,h,d) hd-minor", self_cshd, (qb,), it,
        bytes_moved=self_bytes)

    sk_c, sv_c = f(B, h, K, S, d), f(B, h, K, S, d)

    def self_hcsd(q):
        la = jnp.einsum("bqhd,bhcsd->bqchs", q, sk_c).astype(jnp.float32)
        lg = jnp.sum(la * onehot[:, :, :, None, :], axis=2)
        p = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
        pw = p[:, :, None] * onehot_bf[:, :, :, None, :]
        o = jnp.einsum("bqchs,bhcsd->bqhd", pw, sv_c)
        return (o * 1e-3 + q,)

    results["beam_self_bhcsd"] = timed(
        "beam self (B,h,K,S,d) d-minor", self_hcsd, (qb,), it,
        bytes_moved=self_bytes)

    # greedy self attention (B,h,d,S) vs alternatives
    sg_a, sgv_a = f(B, h, d, S), f(B, h, d, S)

    def gself_cur(q):
        lg = jnp.einsum("bhd,bhds->bhs", q, sg_a).astype(jnp.float32)
        p = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhs,bhds->bhd", p, sgv_a)
        return (o * 1e-3 + q,)

    gbytes = 2 * B * h * d * S * 2
    results["greedy_self_bhds"] = timed(
        "greedy self (B,h,d,S) current", gself_cur, (qg,), it,
        bytes_moved=gbytes)

    sg_b, sgv_b = f(B, S, h, d), f(B, S, h, d)

    def gself_shd(q):
        lg = jnp.einsum("bhd,bshd->bhs", q, sg_b).astype(jnp.float32)
        p = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhs,bshd->bhd", p, sgv_b)
        return (o * 1e-3 + q,)

    results["greedy_self_bshd"] = timed(
        "greedy self (B,S,h,d) hd-minor", gself_shd, (qg,), it,
        bytes_moved=gbytes)

    out = (pathlib.Path(__file__).resolve().parents[1] / "artifacts"
           / "kv_layouts.json")
    out.write_text(json.dumps({k: round(v, 4) for k, v in results.items()},
                              indent=1))
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
