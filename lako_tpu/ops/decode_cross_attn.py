"""Fused decode cross-attention (Pallas, TPU): q·K^T + softmax + ·V in one
kernel against int8-quantized cross K/V.

Why: at the reference eval config (t5-large, B=128, N·L=260,
test_reader.py:65-69) every decode step re-reads the ENTIRE precomputed
cross-attention K/V working set — 24 layers × 2 × (B,h,d,K) ≈ 3.3 GB bf16 —
which is the dominant HBM term of the decode loop (~4 ms/step of the ~5.7 ms
bandwidth floor). Storing K/V as symmetric int8 halves that, but the XLA
einsum path dequantizes through materialized bf16 temporaries, giving the
traffic right back (measured: int8 KV made the unrolled engine SLOWER,
0.91 s vs 0.78 s per batch). This kernel streams the int8 bytes into VMEM
and dequantizes in-register, so the HBM read really is half-width.

Quantization layout (matches models/t5/engine.py::_quantize_kv):
  K_i8, V_i8: (B, h, d, K) int8, key axis minor (128-lane aligned)
  k_scale, v_scale: (B, h, d) f32 per-(b,h,d) channel scales
  dequant: K[b,h,d,k] = K_i8[b,h,d,k] * k_scale[b,h,d]

Per (b,) grid program (one decode row, all heads):
  logits[h,k] = sum_d (q[h,d]*k_scale[h,d]) * K_i8[h,d,k]   (scale folds into q)
  p = softmax(logits + bias[k])                              (f32, masked)
  out[h,d]  = v_scale[h,d] * sum_k p[h,k] * V_i8[h,d,k]      (scale folds out)

The matmuls have M=1 per head (vector-matrix), so MXU utilization is low —
irrelevant here: the op moves ~12.8 MB/row-batch and does ~0.14 GFLOP; it is
purely HBM-bandwidth-bound, and the only thing that matters is that the
bytes crossing HBM are int8, not bf16.

Numerics: tests/test_decode_cross.py pins this against the XLA dequantized
reference in interpret mode (fp32 exact tolerance) and on TPU via
tests/test_tpu_smoke.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(qs_ref, ki_ref, vi_ref, vs_ref, bias_ref, out_ref):
    """Grid (B,). Blocks: qs (1,h,d) f32 (scale-folded q); ki/vi (1,h,d,Kp)
    int8; vs (1,h,d) f32; bias (1,1,Kp) f32; out (1,h,d) f32."""
    import jax.lax as lax

    qs = qs_ref[0]                    # (h, d) f32 — q * k_scale, pre-folded
    ki = ki_ref[0]                    # (h, d, Kp) int8
    vi = vi_ref[0]                    # (h, d, Kp) int8
    vs = vs_ref[0]                    # (h, d) f32
    bias = bias_ref[0]                # (1, Kp) f32 (NEG_INF on pad/masked)

    # logits[h, k] = sum_d qs[h, d] * ki[h, d, k]; dequant happens in-register
    kf = ki.astype(jnp.float32)
    logits = lax.dot_general(
        qs[:, None, :], kf,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]                        # (h, Kp)
    logits = logits + bias

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)          # (h, Kp) f32

    vf = vi.astype(jnp.float32)
    out = lax.dot_general(
        p[:, None, :], vf,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]                        # (h, d)
    out_ref[0] = out * vs


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_cross_attention(q, k_i8, k_scale, v_i8, v_scale, bias,
                                 interpret: bool = False):
    """One decode step of cross attention against int8 K/V.

    Args:
      q: (B, h, d) compute-dtype queries (current step).
      k_i8, v_i8: (B, h, d, K) int8.
      k_scale, v_scale: (B, h, d, 1) or (B, h, d) f32 channel scales.
      bias: (B, 1, K) f32 additive (0 | NEG_INF) key mask.
      interpret: run the Pallas interpreter (CPU tests).

    Returns: (B, h, d) f32 attention outputs (pre o-projection).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, h, d, K = k_i8.shape
    if k_scale.ndim == 4:
        k_scale = k_scale[..., 0]
    if v_scale.ndim == 4:
        v_scale = v_scale[..., 0]
    Kp = _round_up(K, 128)

    # fold the K-channel scale into q once (B·h·d work, negligible)
    qs = q.astype(jnp.float32) * k_scale.astype(jnp.float32)     # (B, h, d)

    pad = Kp - K
    if pad:
        k_i8 = jnp.pad(k_i8, ((0, 0), (0, 0), (0, 0), (0, pad)))
        v_i8 = jnp.pad(v_i8, ((0, 0), (0, 0), (0, 0), (0, pad)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad)),
                       constant_values=NEG_INF)
    bias = bias.astype(jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, d, Kp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, d, Kp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * h * d * Kp,
            bytes_accessed=2 * B * h * d * Kp + 8 * B * h * d
            + 4 * B * Kp,
            transcendentals=B * h * Kp,
        ),
    )(qs, k_i8, v_i8, v_scale.astype(jnp.float32), bias)
    return out


def xla_reference(q, k_i8, k_scale, v_i8, v_scale, bias):
    """Dequantize-then-attend reference (what the einsum path computes)."""
    if k_scale.ndim == 3:
        k_scale = k_scale[..., None]
    if v_scale.ndim == 3:
        v_scale = v_scale[..., None]
    kf = k_i8.astype(jnp.float32) * k_scale.astype(jnp.float32)
    vf = v_i8.astype(jnp.float32) * v_scale.astype(jnp.float32)
    logits = jnp.einsum("bhd,bhdk->bhk", q.astype(jnp.float32), kf)
    logits = logits + bias.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhk,bhdk->bhd", p, vf)
