"""Channels: AWGN, Rayleigh fading, constant Scale.

Capability parity with /root/reference/src/signalprocessing/transmission/
(awgn.cpp, rayleigh.cpp, scale.cpp). The reference's mutex-guarded LCG +
AVX Box-Muller RNG (random.cpp, avx_mathfun.h) is replaced wholesale by
jax.random: counter-based, splittable, reproducible across any sharding —
per-device independence falls out of jax.random.fold_in instead of a lock.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn_sigma(esn0_db: float | jnp.ndarray = None, esn0_linear=None):
    """Noise std dev for a real-valued channel: 1/sqrt(2 Es/N0) (awgn.cpp:30-43)."""
    if esn0_linear is None:
        esn0_linear = 10.0 ** (jnp.asarray(esn0_db) / 10.0)
    return 1.0 / jnp.sqrt(2.0 * jnp.asarray(esn0_linear))


def add_awgn(key, signal, esn0_db=None, esn0_linear=None):
    """signal + N(0, sigma^2) with sigma from Es/N0."""
    sigma = awgn_sigma(esn0_db, esn0_linear)
    noise = jax.random.normal(key, jnp.shape(signal), dtype=jnp.float32)
    return jnp.asarray(signal) + sigma * noise


def apply_rayleigh(key, signal, esn0_db=None, esn0_linear=None):
    """Rayleigh fading + AWGN: y = |h| x + n with h = g1+j g2, g ~ N(0,1),
    noise sigma = 1/sqrt(Es/N0) (rayleigh.cpp:30-74)."""
    if esn0_linear is None:
        esn0_linear = 10.0 ** (jnp.asarray(esn0_db) / 10.0)
    k_fade, k_noise = jax.random.split(key)
    shape = jnp.shape(signal)
    g = jax.random.normal(k_fade, shape + (2,), dtype=jnp.float32)
    fade = jnp.sqrt(jnp.sum(g * g, axis=-1))
    sigma = 1.0 / jnp.sqrt(jnp.asarray(esn0_linear))
    noise = jax.random.normal(k_noise, shape, dtype=jnp.float32)
    return jnp.asarray(signal) * fade + sigma * noise


class Transmitter:
    """OO wrapper mirroring the reference Transmitter base (transmitter.h)."""

    def transmit(self, key, signal):
        raise NotImplementedError


class Awgn(Transmitter):
    def __init__(self, esn0_db: float = 5.0):
        self.set_esn0_db(esn0_db)

    def set_esn0_db(self, esn0_db: float):
        self.esn0_db = float(esn0_db)
        self.esn0_linear = 10.0 ** (self.esn0_db / 10.0)

    def set_esn0_linear(self, esn0_linear: float):
        self.esn0_linear = float(esn0_linear)
        self.esn0_db = 10.0 * jnp.log10(self.esn0_linear)

    def transmit(self, key, signal):
        return add_awgn(key, signal, esn0_linear=self.esn0_linear)


class Rayleigh(Transmitter):
    def __init__(self, esn0_db: float = 5.0):
        self.esn0_db = float(esn0_db)
        self.esn0_linear = 10.0 ** (self.esn0_db / 10.0)

    def set_esn0_linear(self, esn0_linear: float):
        self.esn0_linear = float(esn0_linear)

    def transmit(self, key, signal):
        return apply_rayleigh(key, signal, esn0_linear=self.esn0_linear)


class Scale(Transmitter):
    """Constant amplification for int8 quantization headroom (scale.cpp)."""

    def __init__(self, factor: float = 1.0):
        self.factor = float(factor)

    def set_factor(self, factor: float):
        self.factor = float(factor)

    def transmit(self, key, signal):
        del key
        return jnp.asarray(signal) * self.factor
