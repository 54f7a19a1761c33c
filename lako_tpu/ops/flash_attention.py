"""Pallas fused attention for the FiD encoder.

One kernel per (batch·passage) program computes all heads' attention —
QK^T + additive bias → fp32 softmax → PV — entirely in VMEM, so the (H, L, L)
logits never round-trip through HBM (XLA materializes them otherwise). At FiD
shapes (L ≈ 128–256, D = 64) a whole program's working set is ≤ ~5 MB, well
under the ~16 MB VMEM budget, so no K-streaming is needed.

The backward pass recomputes attention with plain XLA ops via custom_vjp
(flash-style rematerialization): forward gets the fusion win, backward is
unchanged and exactly consistent with the fused forward.

Inputs may have any L; they are padded to the 128-lane tile internally and pad
keys are masked with −inf bias. Falls back to a pure-XLA implementation off-TPU
(and under ``interpret=True`` in tests).

MEASURED (v5e, bf16, B·N=16, H=16, L=130, D=64 — LaKo's headline shape):
XLA 2.04 ms vs this kernel 28.8 ms. At L=130 the 128-tile padding (L→256,
D→128) wastes ~8× of the logits work and XLA's own fusion already avoids most
of the HBM roundtrip, so the kernel LOSES at reference shapes. It is therefore
OFF by default (T5Config.use_flash_attention=False) and retained for
long-context configurations and as the base for a streamed flash variant.
Measure before enabling.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def _xla_attention(q, k, v, bias):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    """Block shapes: q/k/v (1, H, L, D); bias (1, H, L, L); out (1, H, L, D)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # (H, L, L)
        preferred_element_type=jnp.float32,
    )
    logits = logits + bias.astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # (H, L, D)
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _pad_to(x, axis, size):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q, k, v, bias, interpret: bool = False):
    """Fused multi-head attention: (B, H, L, D) × bias (B|1, H|1, L, L) → (B, H, L, D).

    Bias must already contain any key masking (−inf at masked positions).
    """
    return _fused_attention_fwd_impl(q, k, v, bias, interpret)


def _fused_attention_fwd_impl(q, k, v, bias, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    Lk = k.shape[2]
    Lp = _round_up(L, 128)
    Lkp = _round_up(Lk, 128)
    Dp = _round_up(D, 128)

    qp = _pad_to(_pad_to(q, 2, Lp), 3, Dp)
    kp = _pad_to(_pad_to(k, 2, Lkp), 3, Dp)
    vp = _pad_to(_pad_to(v, 2, Lkp), 3, Dp)
    bias = jnp.broadcast_to(bias, (B, H, L, Lk)) if bias is not None else \
        jnp.zeros((B, H, L, Lk), jnp.float32)
    biasp = _pad_to(_pad_to(bias, 2, Lp), 3, Lkp)
    if Lkp != Lk:
        # pad keys must never receive weight
        key_pad = (jnp.arange(Lkp) >= Lk)[None, None, None, :]
        biasp = jnp.where(key_pad, NEG_INF, biasp)

    out = pl.pallas_call(
        _attention_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Lp, Dp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lkp, Dp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lkp, Dp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lp, Lkp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, Lp, Dp), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, Dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * L * Lk * D,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize
            + biasp.size * 4,
            transcendentals=B * H * L * Lk,
        ),
    )(qp, kp, vp, biasp)
    return out[:, :, :L, :D]


def _fwd(q, k, v, bias, interpret):
    out = _fused_attention_fwd_impl(q, k, v, bias, interpret)
    return out, (q, k, v, bias)


def _bwd(interpret, res, g):
    q, k, v, bias = res
    # rematerialized XLA backward (flash-style): differentiate the reference impl
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, bias), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_attention.defvjp(_fwd, _bwd)


def supports_fused_attention() -> bool:
    return jax.default_backend() in ("tpu", "axon") or \
        jax.devices()[0].platform in ("tpu", "axon")
