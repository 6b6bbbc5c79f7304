"""SC decoding kernels: min-sum f, g, and combine.

TPU redesign of the reference's AVX float kernels
(/root/reference/include/polarcode/decoding/avx_float.h:55-302). All
functions are batched elementwise ops over the *last* axis (subcode span);
leading axes are batch (and list) dimensions that map onto the 8x128 VPU.

Conventions:
- LLR > 0 <=> bit 0 (sign bit stores the bit, as in FloatContainer).
- Hard decisions travel in "bipolar" form {+1.,-1.} so that XOR == multiply
  and g's sign application is a multiply (no int<->float conversions).
"""

from __future__ import annotations

import jax.numpy as jnp


def f_minsum(a, b):
    """f(a,b) = sign(a)sign(b) * min(|a|,|b|)  (avx_float.h:55-68)."""
    sign = jnp.sign(a) * jnp.sign(b)
    return sign * jnp.minimum(jnp.abs(a), jnp.abs(b))


def g_update(a, b, left_bipolar):
    """g(a,b,u) = b + (1-2u)*a, with left bits in bipolar form (avx_float.h:71-98)."""
    return b + left_bipolar * a


def f_minsum_bits(a, b):
    """min-sum f on raw float32 bits: sign-XOR + magnitude-min.

    The reference's own AVX formulation (avx_float.h:55
    `_mm256_polarf_ps`: and/xor/min on sign-masked words) — ~3 VPU ops
    cheaper than the jnp.sign product inside Pallas kernels. Identical
    to f_minsum except at exact-zero inputs, where it propagates the
    XOR of the sign bits (like the reference) instead of sign(0)=0;
    only safe where exact zeros cannot occur (channel LLR trees — NOT
    the SCAN beta memory, which initializes to zeros)."""
    import jax

    ai = jax.lax.bitcast_convert_type(a, jnp.int32)
    bi = jax.lax.bitcast_convert_type(b, jnp.int32)
    sign = (ai ^ bi) & jnp.int32(-2147483648)
    mag = jnp.minimum(
        ai & jnp.int32(0x7FFFFFFF), bi & jnp.int32(0x7FFFFFFF)
    )
    return jax.lax.bitcast_convert_type(sign | mag, jnp.float32)


def combine_bipolar(left, right):
    """Combine: left' = left XOR right in bipolar form = left*right (avx_float.h:190)."""
    return left * right


def f_minsum_i8(a, b):
    """int8 min-sum f with int16 intermediate (fip_char.h F semantics)."""
    a16, b16 = a.astype(jnp.int16), b.astype(jnp.int16)
    sign = jnp.sign(a16) * jnp.sign(b16)
    return (sign * jnp.minimum(jnp.abs(a16), jnp.abs(b16))).astype(jnp.int8)


def g_update_i8(a, b, left_bipolar):
    """int8 g with saturation to [-127,127] (fi_adds_epi8 semantics)."""
    s = b.astype(jnp.int16) + left_bipolar.astype(jnp.int16) * a.astype(
        jnp.int16
    )
    return jnp.clip(s, -127, 127).astype(jnp.int8)


def f_minsum_sat(a, b):
    """Saturating-integer min-sum f on bfloat16-stored integer LLRs.

    Bit-identical values to f_minsum_i8 (fip_char.h F semantics): every LLR
    is an integer in [-127, 127], which bfloat16 represents exactly; the
    arithmetic runs in float32 (TPU VPU native width) instead of emulated
    int8/int16 vector ops — that makes the SclFipChar-parity path *faster*
    than f32 (half the HBM traffic at fusion boundaries) instead of 1.75x
    slower (measured: int8/int16 elementwise on v5e)."""
    a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
    sign = jnp.sign(a32) * jnp.sign(b32)
    return (sign * jnp.minimum(jnp.abs(a32), jnp.abs(b32))).astype(a.dtype)


def g_update_sat(a, b, left_bipolar):
    """Saturating g on bfloat16-stored integer LLRs: clip to [-127, 127]
    (fi_adds_epi8 semantics, value-identical to g_update_i8)."""
    s = b.astype(jnp.float32) + left_bipolar.astype(jnp.float32) * a.astype(
        jnp.float32
    )
    return jnp.clip(s, -127.0, 127.0).astype(a.dtype)


def split_llr(llr):
    """Split [..., 2m] node LLRs into (upper a, lower b) halves [..., m]."""
    m = llr.shape[-1] // 2
    return llr[..., :m], llr[..., m:]


def merge_bits(left, right):
    """Concatenate child bipolar decisions back to the parent span."""
    return jnp.concatenate([combine_bipolar(left, right), right], axis=-1)
