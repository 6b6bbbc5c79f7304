"""Modems: BPSK and power-normalized multi-level ASK.

Capability parity with /root/reference/src/signalprocessing/modulation/
(bpsk.cpp, ask.cpp). Batched jnp ops; the whole reference layer of
hand-vectorized AVX loops collapses into a few fused elementwise passes.

Conventions: bit 0 -> +1, bit 1 -> -1 (sign-bit trick, bpsk.cpp:54-66);
demodulators are soft-output (BPSK demod is the identity, bpsk.cpp:32-52).
"""

from __future__ import annotations

import jax.numpy as jnp


def bpsk_modulate(bits):
    """{0,1} bits -> {+1,-1} float32 symbols."""
    return 1.0 - 2.0 * jnp.asarray(bits, dtype=jnp.float32)


def bpsk_demodulate(symbols):
    """Soft demodulation is a no-op: the received sample IS the bit metric."""
    return jnp.asarray(symbols, dtype=jnp.float32)


def _ask_normal_magnitude(bits_per_symbol: int) -> float:
    """sqrt(mean symbol power) over the 2^b-ASK alphabet {±1, ±3, ...}
    (ask.cpp:28-44)."""
    levels = 1 << bits_per_symbol
    power = sum(float(s) ** 2 for s in range(1, levels, 2))
    return (2.0 * power / levels) ** 0.5


def ask_modulate(bits, bits_per_symbol: int, normalize: bool = True):
    """{0,1} bits [..., n*b] -> [..., n] ASK symbols, E[x^2]=1 if normalized.

    Per-symbol accumulation matches ask.cpp:70-80: for bit j (MSB first),
    memory *= bipolar_j; symbol = 2*symbol + memory. The cumulative product
    implements the Gray-ish grouping where each bit flips the residual
    sub-constellation.
    """
    x = bpsk_modulate(bits)
    n_bits = x.shape[-1]
    if n_bits % bits_per_symbol:
        # reference semantics (ask.cpp:57-64): pad the BPSK signal with
        # +1.0 (bit 0) up to a whole symbol; the demodulator emits the pad
        # bits too and the caller slices them off
        pad = bits_per_symbol - n_bits % bits_per_symbol
        x = jnp.concatenate(
            [x, jnp.ones(x.shape[:-1] + (pad,), x.dtype)], axis=-1
        )
        n_bits += pad
    grouped = x.reshape(x.shape[:-1] + (n_bits // bits_per_symbol, bits_per_symbol))
    memory = jnp.cumprod(grouped, axis=-1)
    weights = 2.0 ** jnp.arange(bits_per_symbol - 1, -1, -1, dtype=jnp.float32)
    symbols = jnp.sum(memory * weights, axis=-1)
    if normalize:
        symbols = symbols / _ask_normal_magnitude(bits_per_symbol)
    return symbols


def ask_demodulate(symbols, bits_per_symbol: int, normalize: bool = True):
    """[..., n] symbols -> [..., n*b] soft bit LLP metrics.

    Successive-approximation demapper (ask.cpp:83-101): emit amplitude, then
    amplitude = |amplitude| - shift with halving shift.
    """
    y = jnp.asarray(symbols, dtype=jnp.float32)
    if normalize:
        y = y * _ask_normal_magnitude(bits_per_symbol)
    outs = []
    amplitude = y
    shift = float(1 << (bits_per_symbol - 1))
    for _ in range(bits_per_symbol):
        outs.append(amplitude)
        amplitude = jnp.abs(amplitude) - shift
        shift /= 2.0
    soft = jnp.stack(outs, axis=-1)
    return soft.reshape(y.shape[:-1] + (y.shape[-1] * bits_per_symbol,))


class Modem:
    """OO wrapper mirroring the reference Modem interface (modem.h:23-70)."""

    def modulate(self, bits):
        raise NotImplementedError

    def demodulate(self, symbols):
        raise NotImplementedError


class Bpsk(Modem):
    bits_per_symbol = 1

    def modulate(self, bits):
        return bpsk_modulate(bits)

    def demodulate(self, symbols):
        return bpsk_demodulate(symbols)


class Ask(Modem):
    def __init__(self, bits_per_symbol: int = 1, normalize: bool = True):
        self.bits_per_symbol = bits_per_symbol
        self.normalize = normalize

    def modulate(self, bits):
        return ask_modulate(bits, self.bits_per_symbol, self.normalize)

    def demodulate(self, symbols):
        return ask_demodulate(symbols, self.bits_per_symbol, self.normalize)
