"""K-streamed flash attention (Pallas, TPU) for long encoder sequences.

The round-1 fused kernel (ops/flash_attention.py) materializes the whole
(H, L, L) logits block in VMEM — it cannot scale past L≈512 and loses to XLA
at L=130 (measured 14x). This kernel is the streaming variant: the grid walks
(batch, q-blocks, k-blocks) with the k axis innermost; each program holds one
(H, TQ, D) query block and accumulates softmax online over (H, TK, D) key
blocks with the running max/denominator recurrence (Dao et al., flash
attention), so VMEM stays O(TQ·TK) and the (L, L) logits never exist anywhere.

The bias is FACTORED — a shared relative-position block (1, H, TQ, TK) plus a
per-example key mask (1, TK) — so the (B, H, L, L) additive bias tensor never
materializes in HBM either (T5's relpos is batch-independent; the key mask is
(B, L)).

MEASURED (v5e-1, bf16, H=16, D=64, B·N=16 rows, self-attention,
scalar-reduction fence, 8 chained calls per timing, best of 5;
scripts/bench_flash.py + block sweep, r2):

    L      XLA fused    streamed (TQ=512,TK=1024)    speedup
    130      3.99 ms        4.19 ms                    0.95x  (below the
                                                      crossover; not used)
    512      5.09 ms        4.53 ms                    1.12x
    1024     7.77 ms        6.55 ms                    1.19x
    2048    37.84 ms       13.67 ms                    2.77x  (XLA's
                                          (B,H,L,L) f32 logits spill HBM)

Block sweep at L=2048: (256,512) 18.0 ms, (512,512) 15.8 ms, (512,1024)
13.7 ms (best; default), (1024,1024) exceeds the 16 MB scoped-VMEM limit.

Beyond the 2048 win, the kernel's O(L) memory (vs XLA's O(L^2) logits:
16·16·2048²·4 = 4.3 GB at L=2048) is what lets long-context INFERENCE
batches fit at all. Enablement is config-gated: T5Config.use_flash_attention
=True AND L >= T5Config.flash_min_length (default 512: parity or better
everywhere at or above it, plus the memory win) routes encoder
self-attention here; block sizes come from T5Config.flash_block_q/_block_k.
Everything else stays on XLA.

The BACKWARD is streamed too (three Pallas passes: dK/dV with q innermost,
dQ with k innermost, drel with the batch innermost), recomputing
P = exp(S − lse) from the forward's saved logsumexp — training never
materializes the (B,H,L,L) logits either (the only O(L²) backward tensor is
the inherent (H,L,L) drel, batch-free). MEASURED fwd+bwd (same rig,
sum-of-squares loss, grads of q/k/v/rel):

    L       XLA fwd+bwd    streamed fwd+bwd    speedup
    1024      23.31 ms         17.75 ms          1.31x
    2048      71.17 ms         42.50 ms          1.67x

End-to-end t5-large FiD TRAIN STEP (fwd+bwd+AdamW, remat, donated state,
N=1) with use_flash_attention on vs off: 92.4 vs 102.2 ms at L=1024/B=2
(+11%) and 172.3 vs 199.0 ms at L=2048/B=1 (+15%) — attention is a
fraction of a full step, so the whole-step win is smaller than the
kernel-level one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pad_axis(x, axis, size):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pad_inputs(q, k, v, rel_bias, key_mask, block_q, block_k):
    """Shared forward/backward tiling + padding (they MUST agree: the saved
    lse is padded with the forward's Lp and the backward re-derives it).
    Returns (qp, kp, vp, relp, km, dims) with km (B, 1, Lkp) additive and
    dims = (TQ, TK, Lp, Lkp, Dp)."""
    B, H, L, D = q.shape
    Lk = k.shape[2]
    TQ = min(block_q, _round_up(L, 128))
    TK = min(block_k, _round_up(Lk, 128))
    Lp, Lkp, Dp = _round_up(L, TQ), _round_up(Lk, TK), _round_up(D, 128)

    qp = _pad_axis(_pad_axis(q, 2, Lp), 3, Dp)
    kp = _pad_axis(_pad_axis(k, 2, Lkp), 3, Dp)
    vp = _pad_axis(_pad_axis(v, 2, Lkp), 3, Dp)
    relp = _pad_axis(_pad_axis(rel_bias.astype(jnp.float32), 1, Lp), 2, Lkp)
    # additive key-mask row; padded keys always masked
    km = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
    km = jnp.pad(km, ((0, 0), (0, Lkp - Lk)), constant_values=NEG_INF)
    km = km[:, None, :]                                  # (B, 1, Lkp)
    return qp, kp, vp, relp, km, (TQ, TK, Lp, Lkp, Dp)


def _make_streamed_kernel(with_stats: bool):
    """Grid (B, H, nQ, nK), k innermost. One (batch, head, q-block) per
    program streaming over k-blocks — keeping the head axis in the grid (not
    the block) bounds VMEM at ~1 MB/program (the all-heads variant OOMed
    scoped vmem at L=512: its f32 rel block alone was H·TQ·TK·4 = 8 MB).
    Blocks: q (1, 1, TQ, D); k/v (1, 1, TK, D); rel (1, TQ, TK);
    kmask (1, 1, TK); out (1, 1, TQ, D). Scratch: acc (TQ, D) f32,
    m/l (TQ, 128) f32. with_stats additionally emits per-row logsumexp for
    the streamed backward — the primal (inference) path skips that HBM
    write entirely.
    """

    def kernel(q_ref, k_ref, v_ref, rel_ref, kmask_ref, out_ref, *rest):
        import jax.lax as lax
        from jax.experimental import pallas as pl

        if with_stats:
            lse_ref, acc_ref, m_ref, l_ref = rest
        else:
            acc_ref, m_ref, l_ref = rest

        k_idx = pl.program_id(3)
        n_k = pl.num_programs(3)

        @pl.when(k_idx == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        q = q_ref[0, 0]                   # (TQ, D)
        k = k_ref[0, 0]                   # (TK, D)
        v = v_ref[0, 0]                   # (TK, D)
        rel = rel_ref[0]                  # (TQ, TK) f32
        kmask = kmask_ref[0]              # (1, TK) f32 additive (0 | NEG_INF)

        logits = lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                 # (TQ, TK)
        logits = logits + rel.astype(jnp.float32) + kmask

        m_prev = m_ref[:, 0:1]            # (TQ, 1)
        l_prev = l_ref[:, 0:1]
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)   # rescale factor for old accumulator
        p = jnp.exp(logits - m_new)       # (TQ, TK)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

        pv = lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                 # (TQ, D)
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(k_idx == n_k - 1)
        def _finalize():
            denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
            out_ref[0, 0] = (acc_ref[...] / denom).astype(out_ref.dtype)
            if with_stats:
                lse_ref[0, 0] = m_ref[...] + jnp.log(
                    jnp.maximum(l_ref[...], 1e-30))

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def streamed_attention(q, k, v, rel_bias, key_mask,
                       block_q: int = 512, block_k: int = 1024,
                       interpret: bool = False):
    """Online-softmax attention: (B, H, L, D) → (B, H, L, D).

    rel_bias: (H, Lk) relative-position bias of shape (1|B?, H, L, Lk) is NOT
    accepted — pass the batch-independent (H, L, Lk) tensor. key_mask:
    (B, Lk) bool, True = attend.
    """
    out, _ = _streamed_fwd_impl(q, k, v, rel_bias, key_mask,
                                block_q, block_k, interpret)
    return out


def _streamed_fwd_impl(q, k, v, rel_bias, key_mask, block_q, block_k,
                       interpret, with_stats: bool = False):
    """Forward pallas call. with_stats=True additionally returns the padded
    (B, H, Lp, 128) per-row logsumexp (training residual); the primal path
    skips that output entirely so inference pays no extra HBM write."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    Lk = k.shape[2]
    qp, kp, vp, relp, km, (TQ, TK, Lp, Lkp, Dp) = _pad_inputs(
        q, k, v, rel_bias, key_mask, block_q, block_k)

    out_specs = [pl.BlockSpec((1, 1, TQ, Dp),
                              lambda b, h, qi, ki: (b, h, qi, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, H, Lp, Dp), q.dtype)]
    if with_stats:
        out_specs.append(pl.BlockSpec((1, 1, TQ, 128),
                                      lambda b, h, qi, ki: (b, h, qi, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, H, Lp, 128), jnp.float32))

    grid = (B, H, Lp // TQ, Lkp // TK)
    result = pl.pallas_call(
        _make_streamed_kernel(with_stats),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, qi, ki: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, qi, ki: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, qi, ki: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, TK), lambda b, h, qi, ki: (h, qi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK), lambda b, h, qi, ki: (b, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TQ, Dp), jnp.float32),
            pltpu.VMEM((TQ, 128), jnp.float32),
            pltpu.VMEM((TQ, 128), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * L * Lk * D,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize
            + relp.size * 4,
            transcendentals=B * H * L * Lk,
        ),
    )(qp, kp, vp, relp, km)
    if with_stats:
        out, lse = result
        return out[:, :, :L, :D], lse
    return result[0][:, :, :L, :D], None


def _xla_reference(q, k, v, rel_bias, key_mask):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = logits + rel_bias.astype(jnp.float32)[None]
    logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _fwd(q, k, v, rel_bias, key_mask, block_q, block_k, interpret):
    out, lse = _streamed_fwd_impl(q, k, v, rel_bias, key_mask, block_q,
                                  block_k, interpret, with_stats=True)
    # keep ONE lane of the 128-lane-broadcast stats as the residual (the
    # backward rebroadcasts); storing all 128 would cost 128x the memory
    return out, (q, k, v, rel_bias, key_mask, out, lse[..., :1])


# ---- streamed backward ------------------------------------------------------
# Standard flash-attention backward, three streamed passes that recompute
# P = exp(S - lse) from the forward's saved logsumexp — the (B,H,L,L) logits
# never materialize in the backward either:
#   dV[k] = sum_q P[q,k]·dO[q]          dS[q,k] = P·(dO[q]·V[k] − D[q])
#   dK[k] = sum_q dS[q,k]·Q[q]          dQ[q]  = sum_k dS[q,k]·K[k]
#   drel[h,q,k] = sum_b dS[b,h,q,k]     D[q] = rowsum(dO[q]·O[q])
# Pass 1 (dK/dV): grid (B,H,nK,nQ), q innermost, per-k-block accumulators.
# Pass 2 (dQ):    grid (B,H,nQ,nK), k innermost.
# Pass 3 (drel):  grid (H,nQ,nK,B), b innermost (the batch reduction).


def _ds_parts(q, k, v, do, rel, kmask, lse, dvec):
    """Recompute P and dS for one (TQ,TK) tile; all f32."""
    import jax.lax as lax

    s = lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
    s = s + rel.astype(jnp.float32) + kmask
    p = jnp.exp(s - lse[:, 0:1])
    dp = lax.dot_general(do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    ds = p * (dp - dvec[:, 0:1])
    return p, ds


def _bwd_dkdv_kernel(q_ref, do_ref, lse_ref, dvec_ref, k_ref, v_ref, rel_ref,
                     kmask_ref, dk_ref, dv_ref, dk_acc, dv_acc):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q, do = q_ref[0, 0], do_ref[0, 0]
    k, v = k_ref[0, 0], v_ref[0, 0]
    p, ds = _ds_parts(q, k, v, do, rel_ref[0], kmask_ref[0],
                      lse_ref[0, 0], dvec_ref[0, 0])
    dv_acc[...] += lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_acc[...] += lax.dot_general(
        ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, dvec_ref, k_ref, v_ref, rel_ref,
                   kmask_ref, dq_ref, dq_acc):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q, do = q_ref[0, 0], do_ref[0, 0]
    k, v = k_ref[0, 0], v_ref[0, 0]
    _, ds = _ds_parts(q, k, v, do, rel_ref[0], kmask_ref[0],
                      lse_ref[0, 0], dvec_ref[0, 0])
    dq_acc[...] += lax.dot_general(
        ds.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_drel_kernel(q_ref, do_ref, lse_ref, dvec_ref, k_ref, v_ref,
                     kmask_ref, rel_ref, drel_ref, acc):
    from jax.experimental import pallas as pl

    bi = pl.program_id(3)
    nb = pl.num_programs(3)

    @pl.when(bi == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    q, do = q_ref[0, 0], do_ref[0, 0]
    k, v = k_ref[0, 0], v_ref[0, 0]
    _, ds = _ds_parts(q, k, v, do, rel_ref[0], kmask_ref[0],
                      lse_ref[0, 0], dvec_ref[0, 0])
    acc[...] += ds

    @pl.when(bi == nb - 1)
    def _finalize():
        drel_ref[0] = acc[...]


def _streamed_bwd_impl(q, k, v, rel_bias, key_mask, out, lse, g,
                       block_q, block_k, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    Lk = k.shape[2]
    qp, kp, vp, relp, km, (TQ, TK, Lp, Lkp, Dp) = _pad_inputs(
        q, k, v, rel_bias, key_mask, block_q, block_k)
    gp = _pad_axis(_pad_axis(g.astype(q.dtype), 2, Lp), 3, Dp)
    # residual lse is (B, H, Lp, 1); rebroadcast to the 128-lane block shape
    lse = jnp.broadcast_to(lse, (B, H, Lp, 128))
    # D[q] = rowsum(dO·O); padded rows are zero, so they contribute nothing
    dvec = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dvec = jnp.broadcast_to(_pad_axis(dvec, 2, Lp)[..., None],
                            (B, H, Lp, 128))

    row_spec = pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, ki, qi: (b, h, qi, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, TQ, 128),
                             lambda b, h, ki, qi: (b, h, qi, 0),
                             memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, 1, TK, Dp), lambda b, h, ki, qi: (b, h, ki, 0),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        _bwd_dkdv_kernel,
        grid=(B, H, Lkp // TK, Lp // TQ),
        in_specs=[
            row_spec, row_spec, stat_spec, stat_spec, col_spec, col_spec,
            pl.BlockSpec((1, TQ, TK), lambda b, h, ki, qi: (h, qi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK), lambda b, h, ki, qi: (b, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, ki, qi: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, ki, qi: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, Lkp, Dp), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Lkp, Dp), v.dtype)],
        scratch_shapes=[pltpu.VMEM((TK, Dp), jnp.float32),
                        pltpu.VMEM((TK, Dp), jnp.float32)],
        interpret=interpret,
    )(qp, gp, lse, dvec, kp, vp, relp, km)

    row_spec_q = pl.BlockSpec((1, 1, TQ, Dp),
                              lambda b, h, qi, ki: (b, h, qi, 0),
                              memory_space=pltpu.VMEM)
    stat_spec_q = pl.BlockSpec((1, 1, TQ, 128),
                               lambda b, h, qi, ki: (b, h, qi, 0),
                               memory_space=pltpu.VMEM)
    col_spec_q = pl.BlockSpec((1, 1, TK, Dp),
                              lambda b, h, qi, ki: (b, h, ki, 0),
                              memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        _bwd_dq_kernel,
        grid=(B, H, Lp // TQ, Lkp // TK),
        in_specs=[
            row_spec_q, row_spec_q, stat_spec_q, stat_spec_q, col_spec_q,
            col_spec_q,
            pl.BlockSpec((1, TQ, TK), lambda b, h, qi, ki: (h, qi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK), lambda b, h, qi, ki: (b, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, Dp),
                               lambda b, h, qi, ki: (b, h, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, Dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((TQ, Dp), jnp.float32)],
        interpret=interpret,
    )(qp, gp, lse, dvec, kp, vp, relp, km)

    drel = pl.pallas_call(
        _bwd_drel_kernel,
        grid=(H, Lp // TQ, Lkp // TK, B),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, Dp), lambda h, qi, ki, b: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TQ, Dp), lambda h, qi, ki, b: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TQ, 128), lambda h, qi, ki, b: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TQ, 128), lambda h, qi, ki, b: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK, Dp), lambda h, qi, ki, b: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK, Dp), lambda h, qi, ki, b: (b, h, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TK), lambda h, qi, ki, b: (b, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, TK), lambda h, qi, ki, b: (h, qi, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, TK), lambda h, qi, ki, b: (h, qi, ki),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Lp, Lkp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TQ, TK), jnp.float32)],
        interpret=interpret,
    )(qp, gp, lse, dvec, kp, vp, km, relp)

    return (dq[:, :, :L, :D], dk[:, :, :Lk, :D], dv[:, :, :Lk, :D],
            drel[:, :L, :Lk].astype(rel_bias.dtype))


def _bwd(block_q, block_k, interpret, res, g):
    q, k, v, rel_bias, key_mask, out, lse = res
    dq, dk, dv, drel = _streamed_bwd_impl(q, k, v, rel_bias, key_mask, out,
                                          lse, g, block_q, block_k, interpret)
    return dq, dk, dv, drel, None


streamed_attention.defvjp(_fwd, _bwd)
