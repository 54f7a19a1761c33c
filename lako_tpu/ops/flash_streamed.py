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
    130      4.51 ms        4.06 ms                    1.11x
    512      4.66 ms        4.67 ms                    1.00x
    1024     7.67 ms        6.09 ms                    1.26x
    2048    37.99 ms       13.74 ms                    2.77x  (XLA's
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

LIMITATION (honest): the backward is rematerialized XLA — the custom VJP
recomputes attention via the reference einsum, which materializes the
(B,H,L,L) f32 logits. So TRAINING at long L gets the forward's speed but
NOT its O(L) memory; shrink the row-batch or keep XLA for training at
L≳2048 until a streamed backward kernel (dq/dk/dv online passes) lands.
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


def _streamed_kernel(q_ref, k_ref, v_ref, rel_ref, kmask_ref, out_ref,
                     acc_ref, m_ref, l_ref):
    """Grid (B, H, nQ, nK), k innermost. One (batch, head, q-block) per
    program streaming over k-blocks — keeping the head axis in the grid (not
    the block) bounds VMEM at ~1 MB/program (the all-heads variant OOMed
    scoped vmem at L=512: its f32 rel block alone was H·TQ·TK·4 = 8 MB).
    Blocks: q (1, 1, TQ, D); k/v (1, 1, TK, D); rel (1, TQ, TK);
    kmask (1, 1, TK); out (1, 1, TQ, D). Scratch: acc (TQ, D) f32,
    m/l (TQ, 128) f32.
    """
    import jax.lax as lax
    from jax.experimental import pallas as pl

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def streamed_attention(q, k, v, rel_bias, key_mask,
                       block_q: int = 512, block_k: int = 1024,
                       interpret: bool = False):
    """Online-softmax attention: (B, H, L, D) → (B, H, L, D).

    rel_bias: (H, Lk) relative-position bias of shape (1|B?, H, L, Lk) is NOT
    accepted — pass the batch-independent (H, L, Lk) tensor. key_mask:
    (B, Lk) bool, True = attend.
    """
    return _streamed_fwd_impl(q, k, v, rel_bias, key_mask,
                              block_q, block_k, interpret)


def _streamed_fwd_impl(q, k, v, rel_bias, key_mask, block_q, block_k,
                       interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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

    grid = (B, H, Lp // TQ, Lkp // TK)
    out = pl.pallas_call(
        _streamed_kernel,
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
        out_specs=pl.BlockSpec((1, 1, TQ, Dp),
                               lambda b, h, qi, ki: (b, h, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, Dp), q.dtype),
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
    return out[:, :, :L, :D]


def _xla_reference(q, k, v, rel_bias, key_mask):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = logits + rel_bias.astype(jnp.float32)[None]
    logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _fwd(q, k, v, rel_bias, key_mask, block_q, block_k, interpret):
    out = _streamed_fwd_impl(q, k, v, rel_bias, key_mask, block_q, block_k,
                             interpret)
    return out, (q, k, v, rel_bias, key_mask)


def _bwd(block_q, block_k, interpret, res, g):
    q, k, v, rel_bias, key_mask = res
    _, vjp = jax.vjp(
        lambda q, k, v, rb: _xla_reference(q, k, v, rb, key_mask),
        q, k, v, rel_bias)
    dq, dk, dv, drel = vjp(g)
    return dq, dk, dv, drel, None


streamed_attention.defvjp(_fwd, _bwd)
