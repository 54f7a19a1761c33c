"""8-bit Adam: blockwise-quantized optimizer moments (int8 m / uint8 v).

AdamW's f32 moments are 8 bytes/param — for t5-large that is 5.9 GB of
state and ~5 GB of the measured 12.3 ms optimizer-bandwidth floor in the
train step (artifacts/train_roofline.json); for t5-3b they exceed a v5e's
HBM outright. This transform stores both moments at 1 byte/param with a
per-block (default 256) f32 absmax scale, dequantizing/requantizing inside
the fused update — the standard 8-bit-optimizer design (Dettmers et al.,
"8-bit Optimizers via Block-wise Quantization", arXiv:2110.02861),
rebuilt TPU-style: pure elementwise jnp on (n_blocks, block) views with no
lookup tables. The first moment uses a linear signed int8 code; the second
moment uses a LOG-domain code (2^-31.75 relative range at ~9% resolution —
the role of the paper's dynamic-tree map, since a linear code collapses any
v below blockmax/510 to zero and explodes the sqrt(v)+eps denominator).
Everything fuses into the XLA update.

Why stochastic rounding: an EMA ``v <- b2*v + (1-b2)*g^2`` moves ~0.1% per
step, far below int8's ~0.8%-of-blockmax resolution; nearest rounding
freezes the moment at its lattice point (the update rounds back) until the
gradient regime shifts by >~ the half-step. Stochastic rounding makes each
requantization unbiased, so the EMA tracks in expectation at any update
size. The dither is a counter-based integer hash of (element index, step,
salt) — no key threading through optax, and ~40x cheaper than threefry
(which was measured to cost more than the entire f32 optimizer segment).

The reference trains with HF AdamW(correct_bias=False) (src/util.py:224);
``scale_by_adam_8bit`` mirrors both bias-correction variants of
train/optim.py:_scale_by_adam and drops into the same chain (clipping,
layerwise decay, HF decoupled weight decay), selected by
``OptimConfig(optim="adamw8bit")``.

Measured cost (v5e, t5-large B=32; artifacts/optim8_ab.json): optimizer
state 1.50 GB vs bf16-moment AdamW's 2.95 GB; optimizer segment 44.4 ms
(fused Pallas kernel, the TPU default) vs 14.1 ms — the update is
compute-bound on int8 relayouts, not bandwidth (ops/adam8_kernel.py
docstring has the decomposition). This is a MEMORY knob: choose it when
full Adam semantics matter and optimizer state must halve; choose
adafactor for O(rows+cols) state; plain adamw for raw step throughput.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


class Moment8(NamedTuple):
    """One quantized moment tensor: ``q`` (n_blocks, block) int8/uint8,
    ``scale`` (n_blocks, 1) f32, for a parameter of ``n`` elements
    (zero-padded to a block multiple)."""

    q: Array
    scale: Array


class ScaleByAdam8State(NamedTuple):
    count: Array
    mu: Any   # pytree of Moment8 (int8, signed)
    nu: Any   # pytree of Moment8 (uint8, nonnegative)


def _blocked(x: Array, block: int) -> Array:
    n = x.size
    nb = -(-n // block)
    flat = jnp.ravel(x).astype(jnp.float32)
    return jnp.pad(flat, (0, nb * block - n)).reshape(nb, block)


def _dither_from_idx(idx: Array, count, salt: int) -> Array:
    """Uniform [0,1) dither from a murmur-style integer hash of
    (absolute element index, step count, per-use salt) — ~6 VPU int
    ops/element. The SINGLE source of the hash constants: the Pallas
    kernel (ops/adam8_kernel.py) calls this same function with a
    grid-offset index, and kernel/jnp bit-parity depends on it.

    Counter-based crypto RNG is ~40x more expensive and measured to eat the
    entire bandwidth saving (threefry: 8 ms / 184M uniforms on a v5e, i.e.
    ~64 ms for t5-large's two moments — vs the 13 ms total f32-optimizer
    segment). Stochastic rounding only needs step-decorrelated dither, not
    cryptographic randomness; the finalizer below is the standard GPU/TPU
    dithering choice."""
    h = idx ^ (jnp.asarray(count, jnp.uint32) * jnp.uint32(0x9E3779B9)) \
        ^ jnp.uint32((salt * 0x85EBCA6B) & 0xFFFFFFFF)
    h = h * jnp.uint32(0xCC9E2D51)
    h = (h ^ (h >> 15)) * jnp.uint32(0x1B873593)
    h = h ^ (h >> 13)
    # via i32: Mosaic lacks a u32->f32 cast, and (h>>8) fits in 24 bits
    return ((h >> 8).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(2.0 ** -24))


def _dither(shape, count, salt: int) -> Array:
    idx = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
           * jnp.uint32(shape[1])
           + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    return _dither_from_idx(idx, count, salt)


def _quant_signed(x2d: Array, dither) -> Moment8:
    absmax = jnp.max(jnp.abs(x2d), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    y = x2d / scale
    if dither is not None:
        lo = jnp.floor(y)
        y = lo + (dither < (y - lo))
    q = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return Moment8(q=q, scale=scale)


_LOG_STEPS_PER_OCTAVE = 8.0   # 2^(1/8) ~ 9% per code step, range 2^-31.75

# Bit-trick transcendental replacements (round-5 kernel-speed work): the
# fused update was measured COMPUTE-bound, with exp2/log2 named in the
# decomposition (ops/adam8_kernel.py). Both the jnp path and the Pallas
# kernel call THESE functions, so the two paths keep their exact
# integer-state parity (tests/test_optim8.py::test_fused_kernel_matches_jnp).


def _exp2_neg_code(q_i32: Array) -> Array:
    """Exact-ish 2^(-q/8) for integer codes q in [0, 255] without exp2:
    2^(-(q>>3)) is built directly in the f32 exponent field; the fractional
    2^(-(q&7)/8) is a product of three selected constants (one per bit).
    All integer/select/multiply VPU ops — no transcendental slot."""
    a = q_i32 >> 3          # q >= 0, so arithmetic shift == logical
    b = q_i32 & 7
    base = jax.lax.bitcast_convert_type(
        ((jnp.int32(127) - a) << 23).astype(jnp.int32), jnp.float32)
    one = jnp.float32(1.0)
    frac = (jnp.where((b & 1) != 0, jnp.float32(2.0 ** -0.125), one)
            * jnp.where((b & 2) != 0, jnp.float32(2.0 ** -0.25), one)
            * jnp.where((b & 4) != 0, jnp.float32(2.0 ** -0.5), one))
    return base * frac


# degree-4 fit of log2(m) on m in [1,2): max |err| 1.0e-4 (8e-4 of one
# 1/8-octave code step — far inside the dither noise)
_LOG2_P = (-0.08001089296345223, 0.6355112409058404, -2.0994026211478034,
           4.049617286121415, -2.5056148259511994)


def _log2_bits(x: Array) -> Array:
    """log2(x) for positive normal f32 x via exponent extraction + a
    degree-4 mantissa polynomial (4 FMAs). Subnormal x returns a large
    negative value (biased exponent 0), which every caller clips."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    e = (bits >> 23) & 0xFF  # positive x -> sign bit 0 -> arith == logical
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F800000, jnp.float32)  # [1, 2)
    p = jnp.float32(_LOG2_P[0])
    for c in _LOG2_P[1:]:
        p = p * m + jnp.float32(c)
    return (e - 127).astype(jnp.float32) + p


def _quant_unsigned(x2d: Array, dither) -> Moment8:
    """Log-domain 8-bit code for the (nonnegative) second moment.

    A LINEAR 8-bit code collapses any element below blockmax/510 to zero —
    and g^2 spans >255x within a 256-block routinely, so sqrt(v)+eps
    denominators would explode for the small-gradient elements. The log
    code q = round(-log2(v/blockmax) * 8) covers a 2^-31.75 relative range
    at ~9% resolution (the role of bitsandbytes' dynamic-tree map,
    arXiv:2110.02861 §3), with q=255 reserved for exact zero. Pure VPU
    elementwise — no lookup tables."""
    k = _LOG_STEPS_PER_OCTAVE
    scale = jnp.max(x2d, axis=1, keepdims=True)
    safe = jnp.where(x2d > 0, x2d, 1.0)
    # log2 difference instead of log2(divide): one (nb,1) extraction + no
    # per-element divide; _log2_bits replaces the transcendental
    y = (_log2_bits(jnp.where(scale > 0, scale, 1.0))
         - _log2_bits(safe)) * k
    if dither is not None:
        lo = jnp.floor(y)
        y = lo + (dither < (y - lo))
    q = jnp.clip(jnp.round(y), 0, 254)
    q = jnp.where((x2d <= 0) | (scale <= 0), 255.0, q).astype(jnp.uint8)
    return Moment8(q=q, scale=scale)


def _dequant(m: Moment8) -> Array:
    if m.q.dtype == jnp.uint8:      # log code (second moment)
        qi = m.q.astype(jnp.int32)
        val = m.scale * _exp2_neg_code(qi)
        return jnp.where(m.q == 255, 0.0, val)
    return m.q.astype(jnp.float32) * m.scale


def _unblocked(x2d: Array, shape) -> Array:
    n = 1
    for d in shape:
        n *= d
    return jnp.ravel(x2d)[:n].reshape(shape)


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-6, block: int = 256,
                       correct_bias: bool = False,
                       stochastic_round: bool = True,
                       seed: int = 0x8B17,
                       use_kernel: str = "auto") -> optax.GradientTransformation:
    """Adam second-moment scaling with int8/uint8 blockwise moments.

    Semantics match train/optim.py:_scale_by_adam (correct_bias True =
    torch Adam, False = HF AdamW) up to quantization error; state is
    2 bytes/param + 8/block bytes of scales instead of 8 bytes/param.

    ``use_kernel``: "auto" routes block-aligned leaves >= 64K elements
    through the fused Pallas kernel on TPU backends (ops/adam8_kernel.py —
    one HBM pass; the jnp formulation's reduce-then-use pattern makes XLA
    materialize f32 moment temps, measured 4x slower than f32 AdamW at
    t5-large scale); "never" forces the jnp path; "always" forces the
    kernel (interpret-mode on CPU, for tests)."""
    if use_kernel not in ("auto", "never", "always"):
        raise ValueError(use_kernel)

    def init_fn(params):
        def zq(p):
            return Moment8(q=jnp.zeros((-(-p.size // block), block),
                                       jnp.int8),
                           scale=jnp.ones((-(-p.size // block), 1),
                                          jnp.float32))

        def zqu(p):
            m = zq(p)
            # log code: 255 is the reserved exact-zero symbol
            return Moment8(q=jnp.full(m.q.shape, 255, jnp.uint8),
                           scale=m.scale)

        return ScaleByAdam8State(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zq, params),
            nu=jax.tree_util.tree_map(zqu, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        mu_l = treedef.flatten_up_to(state.mu)
        nu_l = treedef.flatten_up_to(state.nu)

        if use_kernel == "never":
            kernel_ok = lambda g: False
        else:
            # the kernel targets Mosaic; "auto" must not route GPU (Triton
            # lowering is untested for it) — only real TPU backends
            on_tpu = jax.default_backend() in ("tpu", "axon")
            interp = not on_tpu

            def kernel_ok(g):
                if use_kernel == "always":
                    return True
                return on_tpu and g.size % block == 0 and g.size >= 65536

        out_u, out_mu, out_nu = [], [], []
        for i, (g, mq, vq) in enumerate(zip(leaves, mu_l, nu_l)):
            g2d = _blocked(g, block)
            if kernel_ok(g):
                from lako_tpu.ops.adam8_kernel import fused_adam8_update

                u2d, nmq, nms, nvq, nvs = fused_adam8_update(
                    g2d, mq.q, mq.scale, vq.q, vq.scale, count,
                    b1=b1, b2=b2, eps=eps, correct_bias=correct_bias,
                    stochastic_round=stochastic_round, seed=seed,
                    leaf_salt=i, out_dtype=g.dtype,
                    interpret=(use_kernel == "always" and interp))
                out_u.append(_unblocked(u2d, g.shape))
                out_mu.append(Moment8(q=nmq, scale=nms))
                out_nu.append(Moment8(q=nvq, scale=nvs))
                continue
            m = b1 * _dequant(mq) + (1 - b1) * g2d
            v = b2 * _dequant(vq) + (1 - b2) * jnp.square(g2d)
            if correct_bias:
                c = count.astype(jnp.float32)
                m_hat = m / (1 - b1 ** c)
                v_hat = v / (1 - b2 ** c)
                u = m_hat / (jnp.sqrt(v_hat) + eps)
            else:
                u = m / (jnp.sqrt(v) + eps)
            if stochastic_round:
                k_m = _dither(g2d.shape, count, seed + 2 * i)
                k_v = _dither(g2d.shape, count, seed + 2 * i + 1)
            else:
                k_m = k_v = None
            out_u.append(_unblocked(u, g.shape).astype(g.dtype))
            out_mu.append(_quant_signed(m, k_m))
            out_nu.append(_quant_unsigned(v, k_v))

        return (jax.tree_util.tree_unflatten(treedef, out_u),
                ScaleByAdam8State(
                    count=count,
                    mu=jax.tree_util.tree_unflatten(treedef, out_mu),
                    nu=jax.tree_util.tree_unflatten(treedef, out_nu)))

    return optax.GradientTransformation(init_fn, update_fn)


def moment_state_bytes(params, block: int = 256) -> tuple:
    """(8-bit state bytes, f32 Adam state bytes) for a param tree — the
    memory claim, computable without materializing either. ``block`` must
    match the value given to scale_by_adam_8bit."""
    q8 = f32 = 0
    for p in jax.tree_util.tree_leaves(params):
        nb = -(-p.size // block)
        q8 += 2 * (nb * block + 4 * nb)   # two moments: q bytes + scales
        f32 += 8 * p.size
    return q8, f32
