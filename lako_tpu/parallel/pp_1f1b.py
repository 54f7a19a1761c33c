"""Memory-bounded 1F1B-style pipeline schedule for the full FiD train step.

The GPipe step (``pp_train.py``) runs fwd-for-all-microbatches then
bwd-for-all: per-(tick,stage) remat bounds what each *backward* recompute
holds, but the *stage inputs* of all M microbatches — and the
pipe-replicated full encoder output — stay live across the whole step, so
activation memory grows O(M). Classic 1F1B bounds it at O(S) by
interleaving each microbatch's backward as soon as its forward completes.

Encoder-decoder wrinkle: FiD is not a linear pipeline — every decoder layer
cross-attends the full encoder output, and the loss sits after the decoder.
But gradients decompose per microbatch (the loss is a global token mean
whose denominator is known up front), so each microbatch has an independent
depth-first dependency chain over 4 unit types::

    EF(0..S-1)  ->  DF(0..S-1) + tail loss/gy  ->  DB(S-1..0)  ->  EB(S-1..0)

with the running ``d_enc`` cross-attention gradient accumulated along the
DB leg and handed (around the ring) to the EB leg. This module schedules
those chains as a static **wavefront**: every device executes at most one
F-unit (EF|DF) and one B-unit (DB|EB) per tick — uniform tick cost, no
fwd/bwd convoying — and a new microbatch is admitted every 2 ticks. A
parity stagger ``g = (S+1) % 2`` (one parked tick at each ring-wrap
boundary) makes the schedule collision-free for any S; utilization is 100%
in steady state with a fill+drain bubble of ``~4S`` ticks.

Memory: per device the live set is ``(E+S-1)//2 + 1`` encoder stage-inputs
and ``S+1`` (decoder stage-input, encoder-output) pairs — independent of M.
Backward units recompute their stage forward from the stored input
(``jax.vjp``), i.e. per-stage remat is built in. Communication is two
neighbor ``ppermute`` hops per tick (activations forward, gradients
backward); the decoder legs carry the (mB, N*L, H) encoder output / its
gradient along the same hops, which is the comm price 1F1B pays vs GPipe's
replicated-enc indexing.

The whole step is ONE ``lax.scan`` over precomputed (T, S) schedule tables
inside one ``shard_map`` — compile time is O(1) in both T and M. Unit
dispatch is ``lax.switch`` on the per-device table entry, so a device pays
only for the unit it actually runs that tick (the LM-head tail is
additionally ``lax.cond``-gated to the last stage).

Grads exactly match the GPipe step and the single-device ``FiDT5.apply``
(pinned in tests/test_pp_1f1b.py). Dropout is not applied (same contract as
``pp_train``). Reference being pipelined: the FiD training step of
/root/reference/src/model.py:227-234 + train_reader.py:37-120 (which has no
pipeline parallelism at all — SURVEY.md §2.7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lako_tpu.core.config import T5Config
from lako_tpu.models.t5.layers import causal_bias, mask_to_bias
from lako_tpu.models.t5.model import shift_right
from lako_tpu.models.t5.scan_model import _relpos_bias
from lako_tpu.parallel.pipeline import _rms, _stage_apply
from lako_tpu.parallel.pp_train import PPParams, _dec_stage_apply

Array = jax.Array

IDLE, F_EF, F_DF = 0, 1, 2
B_DB, B_EB = 1, 2


class Schedule(NamedTuple):
    """Static wavefront tables. All tables are (T, S) int32; F-slot codes
    are IDLE/F_EF/F_DF, B-slot codes IDLE/B_DB/B_EB; ``*_m`` is the
    microbatch index the unit works on (0 where idle). ``park_*`` marks
    ticks whose incoming f/b message must be parked (ring-wrap stagger)."""

    T: int
    f_code: np.ndarray
    f_m: np.ndarray
    b_code: np.ndarray
    b_m: np.ndarray
    park_f: np.ndarray
    park_b: np.ndarray
    enc_slots: int
    dec_slots: int


def build_schedule(S: int, M: int) -> Schedule:
    """Wavefront tables for S stages, M microbatches.

    Relative trajectory of microbatch m (admitted at ``a = 2m``)::

      EF(s)  at a + s
      DF(s)  at a + S + g + s           (enc_out parked g ticks at device 0)
      DB(s)  at a + C + (S-1-s),   C = 2S + g + 1
      EB(s)  at a + E + (S-1-s),   E = C + S + g   (d_enc parked g ticks)

    ``g = (S+1) % 2`` puts EF/DF (and DB/EB) on opposite tick parities per
    device, so one F-slot and one B-slot per device per tick suffice; the
    construction asserts collision-freedom for the given (S, M).
    """
    if S < 2:
        raise ValueError("pipeline needs at least 2 stages")
    if M < 1:
        raise ValueError("need at least 1 microbatch")
    g = (S + 1) % 2
    C = 2 * S + g + 1
    E = C + S + g
    span = E + S                      # relative ticks 0 .. span-1
    T = 2 * (M - 1) + span
    f_code = np.zeros((T, S), np.int32)
    f_m = np.zeros((T, S), np.int32)
    b_code = np.zeros((T, S), np.int32)
    b_m = np.zeros((T, S), np.int32)
    park_f = np.zeros((T, S), np.int32)
    park_b = np.zeros((T, S), np.int32)

    def place(tbl_c, tbl_m, t, s, code, m):
        # a collision means wrong gradients, the worst training failure —
        # raise (survives python -O, unlike assert)
        if tbl_c[t, s] != IDLE:
            raise RuntimeError(
                f"1F1B schedule collision at tick {t} device {s} "
                f"(S={S}, M={M}) — schedule construction bug")
        tbl_c[t, s] = code
        tbl_m[t, s] = m

    for m in range(M):
        a = 2 * m
        for s in range(S):
            place(f_code, f_m, a + s, s, F_EF, m)
            place(f_code, f_m, a + S + g + s, s, F_DF, m)
            place(b_code, b_m, a + C + (S - 1 - s), s, B_DB, m)
            place(b_code, b_m, a + E + (S - 1 - s), s, B_EB, m)
        # enc_out (from EF(S-1)) arrives at device 0 at tick a+S and is
        # consumed by DF(0) at a+S+g; the full d_enc (from DB(0)) arrives
        # at device S-1 at a+C+S and is consumed by EB(S-1) at a+E.
        # Parking happens at the top of the tick, before the units run, so
        # park-then-consume in the same tick (g=0) is well-ordered.
        park_f[a + S, 0] = 1
        park_b[a + C + S, S - 1] = 1

    # ring sizes from exact lifetimes (device 0 holds longest): EF input
    # stored at a+s, read by EB at a+E+S-1-s; DF input stored at a+S+g+s,
    # read by DB at a+C+S-1-s. A new microbatch lands every 2 ticks.
    enc_slots = (E + S - 1) // 2 + 1
    dec_slots = (C - 1 - g) // 2 + 1
    return Schedule(T, f_code, f_m, b_code, b_m, park_f, park_b,
                    min(enc_slots, M), min(dec_slots, M))


def make_pp_1f1b_loss_and_grads(mesh: Mesh, cfg: T5Config,
                                n_microbatches: int, dtype=jnp.float32,
                                pipe_axis: str = "pipe",
                                data_axis: Optional[str] = None):
    """Build ``fn(pp: PPParams, ids, mask, labels) -> (loss, grads)`` where
    ``grads`` has the PPParams structure (block grads sharded P('pipe'),
    shared grads replicated) — drop-in for the optimizer exactly like
    ``jax.grad`` of the GPipe loss, but scheduled 1F1B."""
    from jax.experimental.shard_map import shard_map

    S = mesh.shape[pipe_axis]
    M = n_microbatches
    sched = build_schedule(S, M)
    axes = (pipe_axis,) if data_axis is None else (pipe_axis, data_axis)
    data_axes = () if data_axis is None else (data_axis,)
    tied = cfg.tie_word_embeddings

    def fn(pp: PPParams, input_ids, mask, labels):
        B, N, L = input_ids.shape
        if B % M:
            raise ValueError(f"batch {B} not divisible by {M} microbatches")
        mB = B // M
        if data_axis is not None and mB % mesh.shape[data_axis]:
            raise ValueError(
                f"microbatch rows {mB} (= batch {B} / {M} microbatches) not "
                f"divisible by mesh axis {data_axis!r}="
                f"{mesh.shape[data_axis]}; lower pp_microbatches or raise "
                f"the batch")
        T_dec = labels.shape[1]
        H = cfg.d_model

        emb_master = pp.shared["embedding"]
        enc_relpos_t = pp.shared["enc_relpos"]
        dec_relpos_t = pp.shared["dec_relpos"]

        # Trainable relpos tables enter the mesh as materialized bias
        # tensors; their table-grads are recovered by these (linear) vjps
        # outside the mesh from the psum'd bias cotangents.
        enc_rp, enc_rp_vjp = jax.vjp(
            lambda t: _relpos_bias(t, L, L, True, cfg), enc_relpos_t)
        dec_rp, dec_rp_vjp = jax.vjp(
            lambda t: _relpos_bias(t, T_dec, T_dec, False, cfg), dec_relpos_t)
        self_bias_mask = causal_bias(T_dec, T_dec)           # concrete

        key_bias = mask_to_bias(mask.reshape(B * N, L)).reshape(
            M, mB * N, 1, 1, L)
        cross_bias = mask_to_bias(mask.reshape(B, N * L)).reshape(
            M, mB, 1, 1, N * L)
        ids_m = input_ids.reshape(M, mB * N, L)
        dec_in = shift_right(labels, cfg.decoder_start_token_id,
                             cfg.pad_token_id).reshape(M, mB, T_dec)
        labels_m = labels.reshape(M, mB, T_dec)
        valid_total = jnp.maximum((labels != -100).sum(), 1).astype(
            jnp.float32)

        in_specs = (PPParams(enc=P(pipe_axis), dec=P(pipe_axis), shared=P()),
                    P(None, data_axis), P(None, data_axis),
                    P(None, data_axis), P(None, data_axis),
                    P(None, data_axis), P())
        out_specs = (P(), PPParams(enc=P(pipe_axis), dec=P(pipe_axis),
                                   shared=P()))

        @functools.partial(shard_map, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_rep=False)
        def run(pp_l, ids_l, kb_l, cb_l, dec_in_l, lbl_l, consts):
            enc_rp_c, dec_rp_c, vtot = consts
            enc_stage = jax.tree_util.tree_map(lambda a: a[0], pp_l.enc)
            dec_stage = jax.tree_util.tree_map(lambda a: a[0], pp_l.dec)
            emb = pp_l.shared["embedding"]
            enc_ln = pp_l.shared["enc_final_ln"]
            dec_ln = pp_l.shared["dec_final_ln"]
            head = pp_l.shared.get("lm_head")
            s = jax.lax.axis_index(pipe_axis)
            is_last = s == S - 1
            is_first = s == 0
            mBn = ids_l.shape[1]          # data-sharded microbatch rows (xN)
            mBl = dec_in_l.shape[1]
            NL = cb_l.shape[-1]

            # ---- unit bodies ---------------------------------------------
            def enc_unit(stage, x, kb, rp, ln_w):
                bias = kb.astype(jnp.float32) + rp
                y = _stage_apply(cfg, dtype, stage, x, bias)
                y_ln = _rms(y, jnp.asarray(ln_w, jnp.float32),
                            cfg.layer_norm_epsilon, dtype)
                return jnp.where(is_last, y_ln, y)

            def dec_unit(stage, x, enc_m, cb, rp):
                sb = rp + self_bias_mask
                return _dec_stage_apply(cfg, dtype, stage, x, enc_m,
                                        cb.astype(jnp.float32), sb)

            if tied:
                def tail_unit(ln_w, e, y, lbl):
                    xh = _rms(y, jnp.asarray(ln_w, jnp.float32),
                              cfg.layer_norm_epsilon, dtype)
                    xh = xh * (cfg.d_model ** -0.5)
                    logits = xh @ jnp.asarray(e, dtype).T
                    return _ce(logits, lbl)
            else:
                def tail_unit(ln_w, hd, y, lbl):
                    xh = _rms(y, jnp.asarray(ln_w, jnp.float32),
                              cfg.layer_norm_epsilon, dtype)
                    logits = xh @ jnp.asarray(hd, dtype)
                    return _ce(logits, lbl)

            def _ce(logits, lbl):
                valid = lbl != -100
                safe = jnp.where(valid, lbl, 0)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                tll = jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
                return -(tll * valid).sum() / vtot

            def embed(tok):
                return jnp.take(jnp.asarray(emb, dtype), tok, axis=0)

            def scatter_emb(gemb, tok, d_x):
                # grad of the embedding gather, only real on stage 0
                def scat(g):
                    return g.at[tok.reshape(-1)].add(
                        d_x.reshape(-1, H).astype(jnp.float32))
                return jax.lax.cond(is_first, scat, lambda g: g, gemb)

            zf32 = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, jnp.float32), t)
            z = lambda *shape: jnp.zeros(shape, dtype)

            # ---- F-slot branches: (m, fmsg, park_eo, fst) -> (fout, fst)
            # fst = (enc_resid, dec_resid_x, dec_resid_e, gy_ring,
            #        g_shared, loss_acc)
            def zero_fout():
                return {"enc": z(mBn, L, H), "dec": z(mBl, T_dec, H),
                        "eo": z(mBl, NL, H)}

            def f_idle(m, fmsg, park_eo, fst):
                return zero_fout(), fst

            def f_ef(m, fmsg, park_eo, fst):
                er, dx, de, gy, gs, la = fst
                tok = jax.lax.dynamic_index_in_dim(ids_l, m, 0,
                                                   keepdims=False)
                x = jnp.where(is_first, embed(tok), fmsg["enc"])
                kb = jax.lax.dynamic_index_in_dim(kb_l, m, 0, keepdims=False)
                y = enc_unit(enc_stage, x, kb, enc_rp_c, enc_ln)
                er = jax.lax.dynamic_update_index_in_dim(
                    er, x, m % sched.enc_slots, 0)
                out = {"enc": y, "dec": z(mBl, T_dec, H),
                       "eo": y.reshape(mBl, NL, H)}
                return out, (er, dx, de, gy, gs, la)

            def f_df(m, fmsg, park_eo, fst):
                er, dx, de, gy, gs, la = fst
                eo_in = jnp.where(is_first, park_eo, fmsg["eo"])
                tok = jax.lax.dynamic_index_in_dim(dec_in_l, m, 0,
                                                   keepdims=False)
                x = jnp.where(is_first, embed(tok), fmsg["dec"])
                cb = jax.lax.dynamic_index_in_dim(cb_l, m, 0, keepdims=False)
                y = dec_unit(dec_stage, x, eo_in, cb, dec_rp_c)
                dx = jax.lax.dynamic_update_index_in_dim(
                    dx, x, m % sched.dec_slots, 0)
                de = jax.lax.dynamic_update_index_in_dim(
                    de, eo_in, m % sched.dec_slots, 0)

                # LM-head tail: loss + d(dec_ln) + d(head|emb) + gy — only
                # the last stage pays for it (runtime cond, not a select)
                lbl = jax.lax.dynamic_index_in_dim(lbl_l, m, 0,
                                                   keepdims=False)
                hw = emb if tied else head

                def tail_real(yy):
                    obj, vjpf = jax.vjp(
                        lambda ln, w, t: tail_unit(ln, w, t, lbl),
                        dec_ln, hw, yy)
                    d_ln, d_w, gy_new = vjpf(jnp.float32(1.0))
                    return obj, d_ln, d_w, gy_new.astype(dtype)

                def tail_zero(yy):
                    return (jnp.float32(0.0), jnp.zeros_like(dec_ln),
                            jnp.zeros_like(hw), jnp.zeros(yy.shape, dtype))

                obj, d_ln, d_w, gy_new = jax.lax.cond(
                    is_last, tail_real, tail_zero, y)
                gs = dict(gs)
                gs["dec_ln"] = gs["dec_ln"] + d_ln.astype(jnp.float32)
                wkey = "emb" if tied else "head"
                gs[wkey] = gs[wkey] + d_w.astype(jnp.float32)
                la = la + obj
                gy = jax.lax.dynamic_update_index_in_dim(gy, gy_new, m % 2, 0)
                out = {"enc": z(mBn, L, H), "dec": y, "eo": eo_in}
                return out, (er, dx, de, gy, gs, la)

            # ---- B-slot branches: (m, bmsg, park_de, resid, gst) ->
            # (bout, gst); resid = (enc_resid, dec_resid_x, dec_resid_e,
            # gy_ring) frozen after this tick's F unit; gst = (g_enc, g_dec,
            # g_shared)
            def zero_bout():
                return {"g_enc": z(mBn, L, H), "g_dec": z(mBl, T_dec, H),
                        "d_eo": z(mBl, NL, H)}

            def b_idle(m, bmsg, park_de, resid, gst):
                return zero_bout(), gst

            def b_db(m, bmsg, park_de, resid, gst):
                er, dx_r, de_r, gy_r = resid
                ge, gd, gs = gst
                x = jax.lax.dynamic_index_in_dim(
                    dx_r, m % sched.dec_slots, 0, keepdims=False)
                eo = jax.lax.dynamic_index_in_dim(
                    de_r, m % sched.dec_slots, 0, keepdims=False)
                cb = jax.lax.dynamic_index_in_dim(cb_l, m, 0, keepdims=False)
                gy = jax.lax.dynamic_index_in_dim(gy_r, m % 2, 0,
                                                  keepdims=False)
                g_in = jnp.where(is_last, gy, bmsg["g_dec"])
                de_acc = jnp.where(is_last, jnp.zeros((mBl, NL, H), dtype),
                                   bmsg["d_eo"])
                _, vjpf = jax.vjp(
                    lambda st, xx, ee, rp: dec_unit(st, xx, ee, cb, rp),
                    dec_stage, x, eo, dec_rp_c)
                d_st, d_x, d_eo, d_rp = vjpf(g_in)
                gd = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32), gd, d_st)
                gs = dict(gs)
                gs["dec_rp"] = gs["dec_rp"] + d_rp.astype(jnp.float32)
                tok = jax.lax.dynamic_index_in_dim(dec_in_l, m, 0,
                                                   keepdims=False)
                gs["emb"] = scatter_emb(gs["emb"], tok, d_x)
                out = {"g_enc": z(mBn, L, H),
                       "g_dec": jnp.where(is_first, jnp.zeros_like(d_x), d_x),
                       "d_eo": de_acc + d_eo}
                return out, (ge, gd, gs)

            def b_eb(m, bmsg, park_de, resid, gst):
                er, dx_r, de_r, gy_r = resid
                ge, gd, gs = gst
                x = jax.lax.dynamic_index_in_dim(
                    er, m % sched.enc_slots, 0, keepdims=False)
                kb = jax.lax.dynamic_index_in_dim(kb_l, m, 0, keepdims=False)
                g_in = jnp.where(is_last, park_de.reshape(mBn, L, H),
                                 bmsg["g_enc"])
                _, vjpf = jax.vjp(
                    lambda st, xx, rp, ln: enc_unit(st, xx, kb, rp, ln),
                    enc_stage, x, enc_rp_c, enc_ln)
                d_st, d_x, d_rp, d_ln = vjpf(g_in)
                ge = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32), ge, d_st)
                gs = dict(gs)
                gs["enc_rp"] = gs["enc_rp"] + d_rp.astype(jnp.float32)
                gs["enc_ln"] = gs["enc_ln"] + d_ln.astype(jnp.float32)
                tok = jax.lax.dynamic_index_in_dim(ids_l, m, 0,
                                                   keepdims=False)
                gs["emb"] = scatter_emb(gs["emb"], tok, d_x)
                out = {"g_enc": jnp.where(is_first, jnp.zeros_like(d_x), d_x),
                       "g_dec": z(mBl, T_dec, H),
                       "d_eo": z(mBl, NL, H)}
                return out, (ge, gd, gs)

            # ---- init state ----------------------------------------------
            g_shared0 = {
                "emb": jnp.zeros(emb.shape, jnp.float32),
                "enc_rp": jnp.zeros(enc_rp_c.shape, jnp.float32),
                "dec_rp": jnp.zeros(dec_rp_c.shape, jnp.float32),
                "enc_ln": jnp.zeros(enc_ln.shape, jnp.float32),
                "dec_ln": jnp.zeros(dec_ln.shape, jnp.float32),
            }
            if not tied:
                g_shared0["head"] = jnp.zeros(head.shape, jnp.float32)
            carry0 = dict(
                fmsg=zero_fout(), bmsg=zero_bout(),
                enc_resid=z(sched.enc_slots, mBn, L, H),
                dec_resid_x=z(sched.dec_slots, mBl, T_dec, H),
                dec_resid_e=z(sched.dec_slots, mBl, NL, H),
                gy_ring=z(2, mBl, T_dec, H),
                park_eo=z(mBl, NL, H), park_de=z(mBl, NL, H),
                g_enc=zf32(enc_stage), g_dec=zf32(dec_stage),
                g_shared=g_shared0, loss=jnp.float32(0.0))

            # per-device schedule columns, selected by the traced stage id
            cols = tuple(jnp.take(jnp.asarray(t), s, axis=1) for t in
                         (sched.f_code, sched.f_m, sched.b_code, sched.b_m,
                          sched.park_f, sched.park_b))

            fwd_perm = [(i, (i + 1) % S) for i in range(S)]
            bwd_perm = [(i, (i - 1) % S) for i in range(S)]

            def tick(carry, xs):
                fc, fm, bc, bm, pf, pb = xs
                park_eo = jnp.where(pf.astype(bool), carry["fmsg"]["eo"],
                                    carry["park_eo"])
                park_de = jnp.where(pb.astype(bool), carry["bmsg"]["d_eo"],
                                    carry["park_de"])
                fst = (carry["enc_resid"], carry["dec_resid_x"],
                       carry["dec_resid_e"], carry["gy_ring"],
                       carry["g_shared"], carry["loss"])
                fout, fst = jax.lax.switch(fc, (f_idle, f_ef, f_df),
                                           fm, carry["fmsg"], park_eo, fst)
                er, dx, de, gy, gsh, la = fst
                bout, (ge, gd, gsh) = jax.lax.switch(
                    bc, (b_idle, b_db, b_eb), bm, carry["bmsg"], park_de,
                    (er, dx, de, gy), (carry["g_enc"], carry["g_dec"], gsh))
                fmsg = jax.tree_util.tree_map(
                    lambda a: jax.lax.ppermute(a, pipe_axis, fwd_perm), fout)
                bmsg = jax.tree_util.tree_map(
                    lambda a: jax.lax.ppermute(a, pipe_axis, bwd_perm), bout)
                return dict(fmsg=fmsg, bmsg=bmsg, enc_resid=er,
                            dec_resid_x=dx, dec_resid_e=de, gy_ring=gy,
                            park_eo=park_eo, park_de=park_de, g_enc=ge,
                            g_dec=gd, g_shared=gsh, loss=la), None

            carry, _ = jax.lax.scan(tick, carry0, cols)

            # ---- reductions ----------------------------------------------
            loss = jax.lax.psum(carry["loss"], axes)
            g_shared = jax.lax.psum(carry["g_shared"], axes)
            g_enc = carry["g_enc"]
            g_dec = carry["g_dec"]
            if data_axes:
                g_enc = jax.lax.psum(g_enc, data_axes)
                g_dec = jax.lax.psum(g_dec, data_axes)
            g_enc = jax.tree_util.tree_map(lambda a: a[None], g_enc)
            g_dec = jax.tree_util.tree_map(lambda a: a[None], g_dec)
            return loss, PPParams(enc=g_enc, dec=g_dec, shared=g_shared)

        consts = (enc_rp, dec_rp, valid_total)
        loss, g = run(pp, ids_m, key_bias, cross_bias, dec_in, labels_m,
                      consts)

        # bias-tensor cotangents -> relpos-table grads (linear vjps)
        (d_enc_t,) = enc_rp_vjp(g.shared["enc_rp"])
        (d_dec_t,) = dec_rp_vjp(g.shared["dec_rp"])
        shared = {
            "embedding": g.shared["emb"].astype(emb_master.dtype),
            "enc_relpos": d_enc_t.astype(enc_relpos_t.dtype),
            "dec_relpos": d_dec_t.astype(dec_relpos_t.dtype),
            "enc_final_ln": g.shared["enc_ln"].astype(
                pp.shared["enc_final_ln"].dtype),
            "dec_final_ln": g.shared["dec_ln"].astype(
                pp.shared["dec_final_ln"].dtype),
        }
        if not tied:
            shared["lm_head"] = g.shared["head"].astype(
                pp.shared["lm_head"].dtype)
        grads = PPParams(
            enc=jax.tree_util.tree_map(
                lambda a, p: a.astype(p.dtype), g.enc, pp.enc),
            dec=jax.tree_util.tree_map(
                lambda a, p: a.astype(p.dtype), g.dec, pp.dec),
            shared=shared)
        return loss, grads

    return fn
