"""Polar butterfly transform (x = u F^{(x)n}, natural order, no bit reversal).

TPU-first redesign of the reference's AVX2 butterfly encoder
(/root/reference/src/polarcode/encoding/butterfly_fip.cpp:15-73): instead of
shifting bits inside 256-bit registers for one codeword, we operate on a
[batch, N] array and let the batch axis fill the VPU lanes; each stage is a
reshape + XOR (or multiply, in bipolar form) that XLA fuses into a handful of
vectorized ops. The transform is an involution and its stages commute, so
stage order is free.
"""

from __future__ import annotations

import jax.numpy as jnp


def butterfly_transform(bits):
    """In-order polar transform on {0,1} bits, last axis length N = 2^n.

    Stage s: x[i] ^= x[i + 2^s] for every i whose s-th bit is 0 —
    the same pairing as ButterflyFipTransform (butterfly_fip.cpp:15-29).
    """
    x = jnp.asarray(bits)
    n_len = x.shape[-1]
    n = n_len.bit_length() - 1
    if (1 << n) != n_len:
        raise ValueError(f"block length {n_len} is not a power of 2")
    lead = x.shape[:-1]
    for s in range(n):
        half = 1 << s
        x = x.reshape(lead + (n_len // (2 * half), 2, half))
        upper = x[..., 0, :] ^ x[..., 1, :]
        x = jnp.stack([upper, x[..., 1, :]], axis=-2)
        x = x.reshape(lead + (n_len,))
    return x


def butterfly_transform_bipolar(signs):
    """Same transform on {+1,-1} floats: XOR becomes multiply (VPU-native)."""
    x = jnp.asarray(signs)
    n_len = x.shape[-1]
    n = n_len.bit_length() - 1
    if (1 << n) != n_len:
        raise ValueError(f"block length {n_len} is not a power of 2")
    lead = x.shape[:-1]
    for s in range(n):
        half = 1 << s
        x = x.reshape(lead + (n_len // (2 * half), 2, half))
        upper = x[..., 0, :] * x[..., 1, :]
        x = jnp.stack([upper, x[..., 1, :]], axis=-2)
        x = x.reshape(lead + (n_len,))
    return x
