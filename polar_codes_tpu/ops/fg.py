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


def combine_bipolar(left, right):
    """Combine: left' = left XOR right in bipolar form = left*right (avx_float.h:190)."""
    return left * right


def split_llr(llr):
    """Split [..., 2m] node LLRs into (upper a, lower b) halves [..., m]."""
    m = llr.shape[-1] // 2
    return llr[..., :m], llr[..., m:]


def merge_bits(left, right):
    """Concatenate child bipolar decisions back to the parent span."""
    return jnp.concatenate([combine_bipolar(left, right), right], axis=-1)
