"""Ancestry-gather beam search on the stacked decode engine.

Beam search was the last decode mode on the round-1 flax path
(``models/t5/beam.py``), which reorders the whole self-KV cache along the
beam axis every step, HF-style (``gather_caches``): at the reference eval
shape (B=128, beams=4, t5-large) that rewrite moves ~2.5 GB/step of HBM
traffic that encodes no information — the reorder is just bookkeeping.

This engine keeps the self-KV cache **append-only per beam slot** and makes
the bookkeeping explicit and tiny instead:

- **Ancestry matrix** ``A (B, K, S) int32``: ``A[b, k, s]`` names the beam
  *slot* whose cache row holds step ``s`` of beam ``k``'s surviving history.
  Each step, every slot writes its fresh K/V into its *own* row at position
  ``step`` (a single (l,B,K,h,d,1) dynamic-update for all layers, same as the
  greedy engine), sets ``A[:, :, step] = identity``, and after top-k selection
  only ``A`` is gathered along the beam axis — (B·K·S)·4 bytes (~100 KB at
  the reference shape) instead of the multi-GB cache rewrite.
- **Gather at attention time, as arithmetic**: self-attention logits are
  computed against *all* slots' cache rows (``bqhd,bchds->bqchs``) and the
  ancestor path is selected with a one-hot of ``A``. Decode attention is
  HBM-bandwidth-bound, so reading the cache once with K× the (tiny) dot-product
  FLOPs costs the same bytes as the attention read itself; no gathered copy of
  the cache is ever materialized.
- **Cross-attention K/V are NOT beam-tiled.** The flax beam path repeats the
  encoder states K× (``beam.py:54-55``), multiplying the *dominant* decode
  HBM stream (cross-KV, ~3.3 GB/step at the reference config) by the beam
  count. Here the query carries the beam axis (``bqhd,bhdk->bqhk``) and the
  per-example cross K/V are read once — beam-4 decode reads the same cross-KV
  bytes as greedy.

Per-step HBM floor at the reference shape (B=128, beams=4, t5-large):
cross-KV 3.3 GB (unchanged from greedy) + weights 0.74 GB + self-KV
4×0.6 GB ≈ 6.4 GB vs the flax path's ~13 GB cross + 2.4 GB self + 2.5 GB
reorder ≈ 18 GB — a ~2.8× bandwidth advantage by construction.

Search semantics are exactly ``models/t5/beam.py`` (itself pinned against HF
``generate``: num_beams=k, length_penalty, early_stopping=False — the
defaults the reference hits via ``model.generate``, src/model.py:54-60):
2k candidates/step, EOS candidates banked into a finished pool, best k
non-EOS continue, live beams banked at the end. Parity is pinned by
tests/test_beam_engine.py.

MEASURED (v5e-1, t5-large, N=2, L=130, max_length=50 — the reference eval
config; r3):

    config                          s/batch    ans/s
    engine K=4, B=128                1.773      72.2   flax beam cannot run
                                                      this config at all:
                                                      beam-tiled cross-KV
                                                      alone is ~13 GB
    engine K=4, B=32                 0.530      60.4   2.75x flax
    flax   K=4, B=32                 1.453      22.0   (cache reorder +
                                                      K-tiled cross reads)
    engine K=1, B=128                0.796     160.9   == greedy engine
                                                      (163.7): the search
                                                      machinery (3x top_k,
                                                      ancestry bookkeeping,
                                                      EOS banking) is free
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.engine import (
    NEG_INF,
    StackedDecoder,
    _decode_relpos_rows,
    _mm,
    _rms,
    _take_embedding,
    engine_supported,
    stack_decoder_params,
)

Array = jax.Array


def blockwise_top_m(logits: Array, scores: Array, m: int,
                    block: int = 1004):
    """Exact top-m of ``(scores[:, :, None] + log_softmax(logits)).reshape(
    B, K*V)`` without running ``lax.top_k`` over the full K·V width.

    XLA's top_k over (B, K·V=128512) costs ~1.06 ms/step at the reference
    beam shape — ~13x its read-bandwidth floor (scripts/bench_beam_parts.py).
    This uses a block-max prefilter that is provably exact, tie-breaks
    included:

    1. block maxes of the candidate scores (a max-reduce, bandwidth-bound,
       reads the bf16 logits not the f32 candidates);
    2. top-m BLOCKS by block max (top_k over K·V/block elements);
    3. final top_k over only the m gathered blocks (m·block elements).

    Exactness: if element x is in the global top-m (counting ties by lower
    index, lax.top_k's rule), fewer than m elements beat it; every block
    ranked above x's block contributes a distinct element beating x, so x's
    block is within the top-m blocks. Gathered blocks are re-sorted into
    ascending block order so the final top_k's positional tie-break equals
    the global index order.

    log_softmax is folded in as a per-(b,k) additive constant
    ``scores - logsumexp(logits)`` — block maxes and the final top_k shift
    with it, so ordering is computed on raw logits plus a scalar. The lse
    reduction is blockwise (same f32 upcast per element as
    ``log_softmax(logits.astype(f32))``; summation ORDER differs, so scores
    can move by float ulps vs the topk path — token parity is pinned by
    tests/test_beam_engine.py::test_blockwise_select_matches).

    Returns (top_scores (B, m) f32, top_idx (B, m) int32 into K·V).
    """
    B, K, V = logits.shape
    if V % block:
        raise ValueError(f"block {block} must divide vocab {V}")
    G = V // block
    lx = logits.reshape(B, K, G, block)
    lf = lx.astype(jnp.float32)
    bmax = jnp.max(lf, axis=-1)                            # (B, K, G)
    rowmax = jnp.max(bmax, axis=-1)                        # (B, K)
    se = jnp.sum(jnp.exp(lf - rowmax[:, :, None, None]), axis=-1)
    lse = rowmax + jnp.log(jnp.sum(se, axis=-1))           # (B, K)
    adj = scores - lse                                     # (B, K)
    cand_bmax = (bmax + adj[:, :, None]).reshape(B, K * G)
    _, blk = jax.lax.top_k(cand_bmax, m)                   # (B, m)
    blk = jnp.sort(blk, axis=-1)                           # ascending: keeps
    #                                           global-index tie-break order
    gathered = jnp.take_along_axis(
        lx.reshape(B, K * G, block), blk[:, :, None], axis=1
    ).astype(jnp.float32)                                  # (B, m, block)
    adj_g = jnp.take_along_axis(adj, blk // G, axis=1)     # (B, m)
    gcand = gathered + adj_g[:, :, None]
    ts, pos = jax.lax.top_k(gcand.reshape(B, m * block), m)
    src_blk = jnp.take_along_axis(blk, pos // block, axis=1)
    top_idx = src_blk * block + pos % block
    return ts, top_idx.astype(jnp.int32)


class BeamEngine:
    """Beam-search FiD decode with stacked decoder weights and an
    append-only, ancestry-indexed self-KV cache.

    Usage::

        eng = BeamEngine(model, max_length=50, num_beams=4)
        tokens = eng.generate(params, input_ids, mask)   # (B, max_length-1)

    Round-5 optimization pass (t5-large B=128 beams=4, the reference eval
    config; artifacts/{beam_ablate,cache_alias,beam_ab}.json):

    - In-situ ablation of the ~35.7 ms step: self-attn 19.3 ms, cache write
      13.7 ms, cross-attn 12.6 ms, blockwise top-2K select 0.35 ms beyond a
      bare max-reduce (costs measured by deleting each part from the real
      program — they overlap, so they sum past the step). Correction over
      the first r5 artifact: the original select/log-softmax ablations
      patched ops only the legacy topk path issues, so against the
      blockwise default they timed an unmodified program; the re-run
      ablates the default path directly and gives the topk-path numbers
      their own full_topk baseline (select 0.54 ms, log_softmax ~0.07 ms).
      full_topk − full = 0.22 ms/step is blockwise's in-situ win, matching
      the end-to-end 72.5 → 72.9 ans/s A/B.
    - HLO (scripts/dump_beam_hlo.py) + an isolated scan microbench
      (scripts/bench_cache_alias.py) showed the (l,B,h,d,K,S) caches get a
      d-minor 64->128 lane-padded layout whose per-step dynamic-update-slice
      is a full padded copy (the isolated pattern: 303 ms -> 2.5 ms when the
      step axis leads). Three cache layouts were built to exploit that —
      ``packed`` (flat m=s*K+k, greedy-engine-like lane writes),
      ``stepmajor`` ((l,S,B,K,h*d) slab writes), ``fusedkv`` (one 2d=128
      cache, half the copy bytes) — and ALL LOSE in the full engine:
      38.1 / 48.3 / 62.7 ans/s vs allslots 72.5. The isolated aliasing win
      does not survive composition: what the alternative layouts save on the
      write they repay in attention-matmul layout (stepmajor's s-leading
      dots, packed's K-times-wider select einsum) and in the transposes XLA
      inserts to feed them. Kept as opt-in knobs so the numbers stay
      reproducible.
    - ``blockwise`` top-2K selection (``blockwise_top_m``) replaces the
      full-width lax.top_k over K*V=128,512 and is the one composition-
      surviving win: allslots 72.5 -> 72.9, gather 73.2 -> 74.2 ans/s.
      It is exact (tie-breaks included; oracle-pinned) so ``select_impl``
      defaults to "auto" = blockwise whenever the vocab factors.
    - Net best known: gather+blockwise 74.2 ans/s (+2.3% over the r3
      default); the DEFAULT stays allslots+auto (72.9) because allslots is
      the formulation whose f32 semantics the HF-parity tests pin exactly.
    """

    def __init__(self, model, max_length: int = 50, num_beams: int = 4,
                 length_penalty: float = 1.0,
                 layer_unroll: Optional[int] = None,
                 self_attn_impl: str = "allslots",
                 select_impl: str = "auto",
                 select_block: int = 251):
        cfg = model.config
        if not engine_supported(cfg):
            raise ValueError(
                "BeamEngine requires homogeneous decoder layers "
                "(cross_attention_stride unset); use models.t5.beam instead")
        if num_beams < 1:
            raise ValueError("num_beams must be >= 1")
        if self_attn_impl not in ("allslots", "gather", "flat", "packed",
                                  "stepmajor", "fusedkv"):
            raise ValueError(
                f"self_attn_impl must be allslots|gather|flat|packed"
                f"|stepmajor|fusedkv, got {self_attn_impl!r}")
        if select_impl not in ("auto", "topk", "blockwise"):
            raise ValueError(
                f"select_impl must be auto|topk|blockwise, "
                f"got {select_impl!r}")
        if select_impl == "auto":
            # blockwise needs block | vocab; fall back to plain top_k when
            # the vocab doesn't factor (e.g. tiny test vocabs)
            select_impl = ("blockwise"
                           if cfg.vocab_size % select_block == 0
                           and cfg.vocab_size // select_block >= 2
                           else "topk")
        elif select_impl == "blockwise":
            # explicit request: validate the same factoring conditions at
            # construction so a bad block size fails here with a clear
            # message, not deep inside jit tracing at first generate()
            if cfg.vocab_size % select_block != 0:
                raise ValueError(
                    f"select_block={select_block} does not divide "
                    f"vocab_size={cfg.vocab_size}; pick a divisor or use "
                    "select_impl='topk'")
            if cfg.vocab_size // select_block < 2:
                raise ValueError(
                    f"select_block={select_block} leaves "
                    f"{cfg.vocab_size // select_block} block(s) of "
                    f"vocab_size={cfg.vocab_size}; blockwise selection "
                    "needs >= 2 blocks (use select_impl='topk')")
        self.model = model
        self.cfg = cfg
        self.max_length = max_length
        self.steps = max_length - 1
        self.num_beams = num_beams
        self.length_penalty = float(length_penalty)
        self.layer_unroll = (cfg.num_decoder_layers if layer_unroll is None
                             else layer_unroll)
        # packed cache sizing: position m = s*K + k in a flat (l,B,h,d,M)
        # cache; pad S so M is a 128-lane multiple when K allows it (K | 128)
        steps = max_length - 1
        if self_attn_impl == "packed":
            if 128 % num_beams == 0:
                per_lane = 128 // num_beams
                self.steps_pad = -(-steps // per_lane) * per_lane
            else:
                self.steps_pad = steps
        else:
            self.steps_pad = steps
        self.self_attn_impl = self_attn_impl
        self.select_impl = select_impl
        self.select_block = select_block
        self.dtype = model.dtype
        self._generate = jax.jit(self._generate_impl)

    # ---- setup -------------------------------------------------------------

    def _encode(self, params, input_ids, mask):
        enc, enc_mask = self.model.apply(
            {"params": params}, input_ids, mask,
            method=type(self.model).encode_passages)
        return enc, enc_mask

    def _project_cross_kv(self, sd: StackedDecoder, enc: Array):
        """enc (B,Ke,H) → cross K/V stacked (l,B,hk,d,Ke), key axis minor.
        One copy per *example* — beams share it through the query axis."""
        d = self.cfg.d_kv
        B, Ke, H = enc.shape

        def proj(w):
            kv = jnp.einsum("bkh,lhe->lbke", enc, w)
            hk = kv.shape[-1] // d
            kv = kv.reshape(kv.shape[0], B, Ke, hk, d)
            return jnp.transpose(kv, (0, 1, 3, 4, 2))     # (l,B,hk,d,Ke)

        return proj(sd.wk_cross), proj(sd.wv_cross)

    # ---- one decode step over all beams ------------------------------------

    def _layer_step(self, x, xs, step, self_pos_bias, cross_bias, onehot):
        """x: (B, K, H) hidden; onehot: (B, K, Kc, S) ancestry selector.
        Returns (x, (k_new, v_new)) with k_new/v_new (B, K, h, d)."""
        cfg = self.cfg
        dtype = self.dtype
        h, d = cfg.num_heads, cfg.d_kv
        (ln_s, wqkv_s, wo_s, ln_c, wq_c, wo_c, ln_m,
         wi, wi0, wi1, wo_m, sk, sv, ck, cv) = xs
        B, K, H = x.shape

        # --- self attention: logits vs ALL slots, ancestor path selected by
        # the one-hot (reads the cache once; never materializes a gather)
        xn = _rms(x.reshape(B * K, H), ln_s, cfg.layer_norm_epsilon, dtype)
        qkv = _mm(xn, wqkv_s, dtype).reshape(B, K, 3, h, d)
        q, k_new, v_new = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # sk/sv: (B, h, d, Kc, S) — dot_general batch dims (b, h) leading,
        # d contracting right after, (c, s) free.
        #
        # Two formulations, selected by ``self_attn_impl`` (numerically
        # identical — the one-hot rows are exact {0,1}, so gathering cache
        # rows before the dot equals dotting against all slots and selecting;
        # pinned by tests/test_beam_engine.py::test_gather_impl_matches):
        #
        # - "allslots": logits vs ALL Kc slots (bqhd,bhdcs->bqchs), ancestor
        #   path selected by the one-hot afterwards. Reads the cache once but
        #   materializes (B,K,Kc,h,S) f32 logits + does Kc x the dot FLOPs in
        #   M=4 micro-matmuls — measured 0.357 ms vs a 0.125 ms byte floor in
        #   isolation (scripts/bench_beam_parts.py, r3).
        # - "gather": one-hot-gather K/V rows to (B,K,h,d,S) first (itself an
        #   einsum contraction over Kc), then plain (bqhd,bqhds->bqhs)
        #   attention. 1/Kc the logit FLOPs, no (B,K,Kc,..) f32 tensor;
        #   measured 0.101 ms in isolation but pays ~2x cache bytes when the
        #   gathered copies stream through HBM. NOTE: on TPU bf16 the gather
        #   changes where the f32->bf16 rounding happens, so token outputs can
        #   flip at near-ties vs allslots (exact-equal in f32; the CPU parity
        #   tests pass) — measured mismatch rate in scripts/bench_beam_ab.py.
        # - "flat": same select-after-dot order as allslots but the cache
        #   viewed as one (B,h,d,Kc*S) free axis — one larger matmul per
        #   (b,h) instead of Kc-structured micro matmuls; measured 0.177 ms
        #   in isolation (XLA's different K-split still moves the bf16
        #   rounding points, so it is not bitwise-equal on TPU either).
        #
        # Engine A/B at the reference eval config (t5-large B=128 beams=4,
        # artifacts/beam_ab.json, r3): allslots 72.1 ans/s, gather 73.2
        # (+1.5%, 29/128 rows flip at bf16 near-ties), flat 66.8. The micro
        # wins do not survive the full engine step, so the default stays
        # "allslots" — it is the formulation whose f32 semantics the
        # HF-parity tests pin exactly; "gather" is an opt-in +1.5%.
        # - "packed"/"stepmajor"/"fusedkv": three cache layouts built in r5
        #   to attack the 13.7 ms/step cache write the in-situ ablation
        #   found (artifacts/beam_ablate.json; HLO via scripts/
        #   dump_beam_hlo.py shows the (B,h,d,K,S) cache gets a d-minor
        #   64→128 lane-padded layout whose per-step dynamic-update-slice is
        #   a full padded copy, not an in-place write). packed: flat
        #   (B,h,d,M) with m = s*K+k, mirroring the greedy engine's
        #   in-place-friendly structure; stepmajor: (l,S,B,K,h*d) so the
        #   write is a second-major slab; fusedkv: one (B,h,2d,K,S) cache,
        #   lane axis 2d=128 exact, one write for K and V. ALL THREE LOSE
        #   in the full engine (38.1 / 48.3 / 62.7 vs allslots 72.5 ans/s,
        #   artifacts/beam_ab.json) — the write savings are repaid in
        #   attention-matmul layouts and XLA-inserted transposes. Kept as
        #   opt-in knobs; see the class docstring for the evidence chain.
        if self.self_attn_impl == "packed":
            M = sk.shape[-1]
            Sp = M // K
            pos = jnp.arange(Sp)
            la = jnp.einsum("bqhd,bhdm->bqhm", q, sk).astype(jnp.float32)
            la = la.reshape(B, K, h, Sp, K)
            # onehot here is (B, Kq, Sp, Kc)
            logits = jnp.einsum("bqhsc,bqsc->bqhs", la, onehot)
        elif self.self_attn_impl == "stepmajor":
            S = sk.shape[0]
            pos = jnp.arange(S)
        elif self.self_attn_impl == "fusedkv":
            # one (B, h, 2d, K, S) cache, K rows in [:d], V rows in [d:]:
            # the lane axis is 2d = 128 exact (no 64->128 pad, half the
            # physical copy bytes) and ONE slab write covers both
            S = sk.shape[-1]
            pos = jnp.arange(S)
            sk, sv = sk[:, :, :d], sk[:, :, d:]
        else:
            S = sk.shape[-1]
            pos = jnp.arange(S)
        if self.self_attn_impl == "packed":
            pass
        elif self.self_attn_impl == "stepmajor":
            # per-layer cache slice (S, B, Kc, h*d): same select-after-dot
            # math as allslots, only the index order differs (s leading so
            # the per-step write is a second-major slab, not a lane write)
            k5 = sk.reshape(S, B, K, h, d)
            logits_all = jnp.einsum("bqhd,sbchd->bqchs", q, k5
                                    ).astype(jnp.float32)
            logits = jnp.sum(logits_all * onehot[:, :, :, None, :], axis=2)
        elif self.self_attn_impl == "gather":
            onehot_d = onehot.astype(dtype)
            ksel = jnp.einsum("bqcs,bhdcs->bqhds", onehot_d, sk)
            vsel = jnp.einsum("bqcs,bhdcs->bqhds", onehot_d, sv)
            logits = jnp.einsum("bqhd,bqhds->bqhs", q, ksel
                                ).astype(jnp.float32)
        elif self.self_attn_impl == "flat":
            Kc = sk.shape[-2]
            sk_f = sk.reshape(*sk.shape[:-2], Kc * S)
            logits_all = jnp.einsum("bqhd,bhdm->bqhm", q, sk_f
                                    ).astype(jnp.float32)
            logits = (logits_all.reshape(B, K, h, Kc, S)
                      * onehot[:, :, None, :, :]).sum(axis=3)
        else:
            logits_all = jnp.einsum("bqhd,bhdcs->bqchs", q, sk
                                    ).astype(jnp.float32)
            logits = jnp.sum(logits_all * onehot[:, :, :, None, :], axis=2)
        logit_now = jnp.sum(q * k_new, axis=-1).astype(jnp.float32)  # (B,K,h)
        logits = jnp.where(pos[None, None, None, :] == step,
                           logit_now[..., None], logits)
        bias = jnp.where(pos[None, :] <= step, self_pos_bias, NEG_INF)  # (h,S)
        logits = logits + bias[None, None]
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)  # (B,K,h,S)
        if self.self_attn_impl == "packed":
            M = sv.shape[-1]
            # pw[b,q,h,s,c] = probs * onehot, flattened back to m = s*K+c
            pw = (probs[:, :, :, :, None]
                  * onehot[:, :, None, :, :].astype(dtype)).reshape(
                      B, K, h, M)
            out = jnp.einsum("bqhm,bhdm->bqhd", pw, sv)
        elif self.self_attn_impl == "stepmajor":
            v5 = sv.reshape(S, B, K, h, d)
            pw = probs[:, :, None] * onehot[:, :, :, None, :].astype(dtype)
            out = jnp.einsum("bqchs,sbchd->bqhd", pw, v5)
        elif self.self_attn_impl == "gather":
            out = jnp.einsum("bqhs,bqhds->bqhd", probs, vsel)
        elif self.self_attn_impl == "flat":
            Kc = sv.shape[-2]
            pw = (probs[:, :, :, None, :]
                  * onehot[:, :, None, :, :].astype(dtype)
                  ).reshape(B, K, h, Kc * S)
            out = jnp.einsum("bqhm,bhdm->bqhd", pw,
                             sv.reshape(*sv.shape[:-2], Kc * S))
        else:
            pw = probs[:, :, None] * onehot[:, :, :, None, :].astype(dtype)
            out = jnp.einsum("bqchs,bhdcs->bqhd", pw, sv)
        p_now = jnp.take_along_axis(
            probs, jnp.full((B, K, h, 1), step, dtype=jnp.int32), axis=-1)
        out = out + p_now * v_new
        x = x + _mm(out.reshape(B * K, h * d), wo_s, dtype).reshape(B, K, H)

        # --- cross attention: per-example K/V, beam axis rides the query
        xn = _rms(x.reshape(B * K, H), ln_c, cfg.layer_norm_epsilon, dtype)
        qc = _mm(xn, wq_c, dtype).reshape(B, K, h, d)
        hk = ck.shape[1]
        if hk == h:
            cl = jnp.einsum("bqhd,bhdk->bqhk", qc, ck).astype(jnp.float32)
        else:  # multiquery: one shared K/V head
            cl = jnp.einsum("bqhd,bdk->bqhk", qc, ck[:, 0]
                            ).astype(jnp.float32)
        cl = cl + cross_bias                                  # (B,1,1,Ke)
        cp = jax.nn.softmax(cl, axis=-1).astype(dtype)
        if hk == h:
            co = jnp.einsum("bqhk,bhdk->bqhd", cp, cv)
        else:
            co = jnp.einsum("bqhk,bdk->bqhd", cp, cv[:, 0])
        x = x + _mm(co.reshape(B * K, h * d), wo_c, dtype).reshape(B, K, H)

        # --- mlp
        xn = _rms(x.reshape(B * K, H), ln_m, cfg.layer_norm_epsilon, dtype)
        if wi is not None:
            act = getattr(jax.nn, cfg.feed_forward_proj)(_mm(xn, wi, dtype))
        else:
            gact = cfg.feed_forward_proj.removeprefix("gated-")
            act = getattr(jax.nn, gact)(_mm(xn, wi0, dtype)) \
                * _mm(xn, wi1, dtype)
        x = x + _mm(act, wo_m, dtype).reshape(B, K, H)
        return x, (k_new, v_new)

    def _one_step(self, sd: StackedDecoder, tok, caches, ancestry, cross_kv,
                  relpos_rows, cross_bias, step):
        """tok (B,K) int32 → (logits (B,K,V), new caches). ``ancestry`` must
        already name this step's writer (identity at position ``step``)."""
        cfg = self.cfg
        dtype = self.dtype
        sk, sv = caches
        ck, cv = cross_kv
        B, K = tok.shape
        x = _take_embedding(sd.embedding, tok, dtype)          # (B,K,H)
        self_pos_bias = jax.lax.dynamic_index_in_dim(
            relpos_rows, step, axis=0, keepdims=False)         # (h, S)
        # Selector shared by every layer this step. Positions > step select
        # slot 0 arbitrarily — they are masked by the causal bias before
        # softmax. Shape (B, Kq, Kc, S) for the slot-structured impls;
        # (B, Kq, Sp, Kc) for "packed" (padded positions never selected:
        # step < steps <= steps_pad keeps the causal mask on them).
        if self.self_attn_impl == "packed":
            Sp = self.steps_pad
            anc_p = jnp.pad(ancestry, ((0, 0), (0, 0),
                                       (0, Sp - ancestry.shape[-1])))
            onehot = (anc_p[:, :, :, None]
                      == jnp.arange(K)[None, None, None, :]
                      ).astype(jnp.float32)
        else:
            onehot = (ancestry[:, :, None, :]
                      == jnp.arange(K)[None, None, :, None]
                      ).astype(jnp.float32)

        xs = (sd.ln_self, sd.wqkv_self, sd.wo_self,
              sd.ln_cross, sd.wq_cross, sd.wo_cross, sd.ln_mlp,
              sd.wi, sd.wi_0, sd.wi_1, sd.wo_mlp, sk, sv, ck, cv)

        def body(x, layer_xs):
            return self._layer_step(x, layer_xs, step, self_pos_bias,
                                    cross_bias, onehot)

        x, (k_cols, v_cols) = jax.lax.scan(
            body, x, xs,
            unroll=min(self.layer_unroll, cfg.num_decoder_layers))

        if self.self_attn_impl == "packed":
            # flat cache (l,B,h,d,M): this step's K rows live at m=step*K..+K
            # — ONE contiguous lane-aligned K-wide write, the same structure
            # as the greedy engine's (whose update XLA keeps in place)
            def cols_to_cache(cols, cache):
                return jnp.transpose(cols.astype(cache.dtype),
                                     (0, 1, 3, 4, 2))      # (l,B,h,d,K)

            new_sk = jax.lax.dynamic_update_slice(
                sk, cols_to_cache(k_cols, sk), (0, 0, 0, 0, step * K))
            new_sv = jax.lax.dynamic_update_slice(
                sv, cols_to_cache(v_cols, sv), (0, 0, 0, 0, step * K))
        elif self.self_attn_impl == "fusedkv":
            # one (l,B,h,2d,K,1) column covering BOTH K and V: half the
            # copy traffic of two d=64 lane-padded caches
            kv_cols = jnp.concatenate([k_cols, v_cols], axis=-1)
            col = jnp.transpose(kv_cols.astype(sk.dtype),
                                (0, 1, 3, 4, 2))[..., None]
            new_sk = jax.lax.dynamic_update_slice(
                sk, col, (0, 0, 0, 0, 0, step))
            new_sv = None
        elif self.self_attn_impl == "stepmajor":
            # (l, S, B, K, h*d): one (l,1,B,K,hd) slab at step — the write
            # is second-major, every minor dim full-width (no dynamic lane
            # offset, no column scatter)
            def cols_to_cache(cols, cache):
                l = cols.shape[0]
                return cols.astype(cache.dtype).reshape(
                    l, 1, B, K, cols.shape[-2] * cols.shape[-1])

            new_sk = jax.lax.dynamic_update_slice(
                sk, cols_to_cache(k_cols, sk), (0, step, 0, 0, 0))
            new_sv = jax.lax.dynamic_update_slice(
                sv, cols_to_cache(v_cols, sv), (0, step, 0, 0, 0))
        else:
            # append-only: one (l,B,h,d,K,1) column write for all layers (the
            # (l,B,K,h,d) -> (l,B,h,d,K) transpose is a few MB, once per
            # step)
            def cols_to_cache(cols, cache):
                return jnp.transpose(cols.astype(cache.dtype),
                                     (0, 1, 3, 4, 2))[..., None]

            new_sk = jax.lax.dynamic_update_slice(
                sk, cols_to_cache(k_cols, sk), (0, 0, 0, 0, 0, step))
            new_sv = jax.lax.dynamic_update_slice(
                sv, cols_to_cache(v_cols, sv), (0, 0, 0, 0, 0, step))

        x = _rms(x, sd.final_ln, cfg.layer_norm_epsilon, dtype)
        if sd.lm_head is not None:
            logits = _mm(x.reshape(-1, x.shape[-1]), sd.lm_head, dtype)
        else:
            if cfg.tie_word_embeddings:
                x = x * (cfg.d_model ** -0.5)
            logits = x.reshape(-1, x.shape[-1]) @ sd.embedding.T
        return logits.reshape(B, K, -1), (new_sk, new_sv)

    # ---- beam search loop --------------------------------------------------

    def _generate_impl(self, params, input_ids, mask):
        cfg = self.cfg
        B = input_ids.shape[0]
        K = self.num_beams
        steps = self.steps
        V = cfg.vocab_size
        h, d = cfg.num_heads, cfg.d_kv

        sd = stack_decoder_params(params, cfg, dtype=self.dtype)
        enc, enc_mask = self._encode(params, input_ids, mask)
        cross_kv = self._project_cross_kv(sd, enc)
        cross_bias = jnp.where(enc_mask, 0.0, NEG_INF)[:, None, None, :]
        relpos_rows = _decode_relpos_rows(sd.relpos, cfg, steps)
        if self.self_attn_impl == "packed":
            if self.steps_pad > steps:
                # bias values at padded positions are irrelevant (causally
                # masked: step < steps <= steps_pad), zero-pad for shape
                relpos_rows = jnp.pad(
                    relpos_rows,
                    ((0, 0), (0, 0), (0, self.steps_pad - steps)))
            zeros = jnp.zeros(
                (cfg.num_decoder_layers, B, h, d, self.steps_pad * K),
                dtype=self.dtype)
        elif self.self_attn_impl == "stepmajor":
            zeros = jnp.zeros(
                (cfg.num_decoder_layers, steps, B, K, h * d),
                dtype=self.dtype)
        elif self.self_attn_impl == "fusedkv":
            zeros = jnp.zeros((cfg.num_decoder_layers, B, h, 2 * d, K,
                               steps), dtype=self.dtype)
        else:
            zeros = jnp.zeros((cfg.num_decoder_layers, B, h, d, K, steps),
                              dtype=self.dtype)
        caches = ((zeros, None) if self.self_attn_impl == "fusedkv"
                  else (zeros, zeros))
        ancestry = jnp.zeros((B, K, steps), jnp.int32)

        # search state mirrors models/t5/beam.py exactly (HF-pinned there)
        init_tokens = jnp.full((B, K, steps), cfg.pad_token_id, jnp.int32)
        init_scores = jnp.concatenate(
            [jnp.zeros((B, 1)), jnp.full((B, K - 1), NEG_INF)], axis=1
        ).astype(jnp.float32)
        fin_tokens = jnp.full((B, K, steps), cfg.pad_token_id, jnp.int32)
        fin_scores = jnp.full((B, K), NEG_INF, jnp.float32)
        start = jnp.full((B, K), cfg.decoder_start_token_id, jnp.int32)
        identity = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                                    (B, K, 1))

        def body(carry, step):
            tokens, scores, caches_, anc, fin_t, fin_s, prev = carry
            # this step's K/V rows are written by their own slots
            anc = jax.lax.dynamic_update_slice(anc, identity, (0, 0, step))
            logits, caches_ = self._one_step(
                sd, prev, caches_, anc, cross_kv, relpos_rows, cross_bias,
                step)
            if self.select_impl == "blockwise":
                top_scores, top_idx = blockwise_top_m(
                    logits, scores, 2 * K, block=self.select_block)
            else:
                logp = jax.nn.log_softmax(logits.astype(jnp.float32),
                                          axis=-1)
                cand = scores[:, :, None] + logp               # (B, K, V)
                top_scores, top_idx = jax.lax.top_k(
                    cand.reshape(B, K * V), 2 * K)
            src_beam = top_idx // V
            tok = (top_idx % V).astype(jnp.int32)
            is_eos = tok == cfg.eos_token_id

            # bank EOS candidates into the finished pool
            length = (step + 1).astype(jnp.float32)
            norm = top_scores / (length ** self.length_penalty)
            eos_scores = jnp.where(is_eos, norm, NEG_INF)
            pool_scores = jnp.concatenate([fin_s, eos_scores], axis=1)
            src_prefix = jnp.take_along_axis(tokens, src_beam[:, :, None],
                                             axis=1)
            onehot_t = jax.nn.one_hot(step, steps, dtype=jnp.int32)
            eos_seq = src_prefix * (1 - onehot_t) + cfg.eos_token_id * onehot_t
            pool_tokens = jnp.concatenate([fin_t, eos_seq], axis=1)
            new_fin_s, fin_idx = jax.lax.top_k(pool_scores, K)
            new_fin_t = jnp.take_along_axis(pool_tokens, fin_idx[:, :, None],
                                            axis=1)

            # continue with the best K non-EOS candidates
            cont_scores = jnp.where(is_eos, NEG_INF, top_scores)
            live_scores, live_pos = jax.lax.top_k(cont_scores, K)
            live_beam = jnp.take_along_axis(src_beam, live_pos, axis=1)
            live_tok = jnp.take_along_axis(tok, live_pos, axis=1)
            new_tokens = jnp.take_along_axis(tokens, live_beam[:, :, None],
                                             axis=1)
            new_tokens = (new_tokens * (1 - onehot_t)
                          + live_tok[:, :, None] * onehot_t)

            # the whole cache reorder, in 4·B·K·S bytes
            anc = jnp.take_along_axis(anc, live_beam[:, :, None], axis=1)
            return (new_tokens, live_scores, caches_, anc, new_fin_t,
                    new_fin_s, live_tok), None

        carry = (init_tokens, init_scores, caches, ancestry, fin_tokens,
                 fin_scores, start)
        (tokens, scores, _, _, fin_t, fin_s, _), _ = jax.lax.scan(
            body, carry, jnp.arange(steps, dtype=jnp.int32))

        # bank the surviving live beams (length = steps)
        live_norm = scores / (float(steps) ** self.length_penalty)
        pool_scores = jnp.concatenate([fin_s, live_norm], axis=1)
        pool_tokens = jnp.concatenate([fin_t, tokens], axis=1)
        best = jnp.argmax(pool_scores, axis=1)
        out = jnp.take_along_axis(pool_tokens, best[:, None, None],
                                  axis=1)[:, 0]

        # pad everything after the first EOS
        eos_mask = out == cfg.eos_token_id
        after = jnp.cumsum(jnp.cumsum(eos_mask, axis=1), axis=1) > 1
        return jnp.where(after, cfg.pad_token_id, out)

    def generate(self, params, input_ids, mask):
        """(params, (B,N,L) ids, (B,N,L) mask) → tokens (B, max_length-1),
        padded after the first EOS. Matches models/t5/beam.py output."""
        return self._generate(params, input_ids, mask)


def make_beam_engine_generate_fn(model, max_length: int = 50,
                                 num_beams: int = 4,
                                 length_penalty: float = 1.0,
                                 layer_unroll: Optional[int] = None,
                                 self_attn_impl: str = "allslots",
                                 select_impl: str = "auto"):
    """Drop-in replacement for beam.make_beam_generate_fn on the engine.

    ``self_attn_impl``: allslots (default) | gather | flat — the measured A/B
    in the BeamEngine docstring; reachable from configs via
    ReaderTrainConfig.decode_self_attn_impl.
    ``select_impl``: auto (blockwise when the vocab factors) | topk |
    blockwise — see ``blockwise_top_m``."""
    eng = BeamEngine(model, max_length=max_length, num_beams=num_beams,
                     length_penalty=length_penalty, layer_unroll=layer_unroll,
                     self_attn_impl=self_attn_impl, select_impl=select_impl)

    def fn(params, input_ids, mask):
        return eng.generate(params, input_ids, mask)

    return fn
