"""Bhattacharyya-bound ("BB") construction.

Same math as the reference's default constructor
(/root/reference/src/polarcode/construction/bhattacharrya.cpp:39-81):
initial parameter z = exp(-2 * 10^(designSNR/10) * K / N), then the in-place
stage recursion z_even <- 2z - z^2, z_odd <- z^2 evaluated top-down, and the
N-K *least reliable* (largest z) channels are frozen, with stable descending
tie-breaking (lowest index first among equal parameters).
"""

from __future__ import annotations

import numpy as np


def bhattacharyya_initial_parameter(n: int, k: int, design_snr_db: float) -> float:
    """Initial Bhattacharyya parameter from the design SNR.

    Mirrors Bhattacharrya::setParameterByDesignSNR
    (bhattacharrya.cpp:39-44): eta = exp(-2 * snr_linear * K / N).
    """
    snr_linear = 10.0 ** (design_snr_db / 10.0)
    return float(np.exp(-2.0 * snr_linear * k / n))


def bhattacharyya_parameters(block_length: int, initial: float) -> np.ndarray:
    """Per-channel Bhattacharyya parameters via the Arikan/Vangala recursion.

    The reference walks stages from coarse to fine, splitting each value v
    into (2v - v^2, v^2) at offset pairs (j, j + 2^stage)
    (bhattacharrya.cpp:66-81). Vectorized equivalent: repeatedly interleave.
    """
    n = block_length.bit_length() - 1
    if (1 << n) != block_length:
        raise ValueError(f"block length {block_length} is not a power of 2")
    z = np.empty(block_length, dtype=np.float64)
    z[0] = initial
    for stage in range(n - 1, -1, -1):
        b = 1 << stage
        step = b << 1
        t = z[0:block_length:step].copy()
        z[b::step] = t * t
        z[0:block_length:step] = 2.0 * t - t * t
    return z


def bhattacharyya_frozen_bits(
    block_length: int, info_length: int, design_snr_db: float = 0.0
) -> np.ndarray:
    """Frozen-bit positions (sorted ascending) for the BB construction.

    Matches Bhattacharrya::construct (bhattacharrya.cpp:46-64): stable
    descending sort of the channel parameters, freeze the first N-K.
    The reference stores parameters as float32 before sorting
    (constructor.h mChannelParameters), so ties are evaluated in float32.
    """
    initial = bhattacharyya_initial_parameter(block_length, info_length, design_snr_db)
    z = bhattacharyya_parameters(block_length, initial).astype(np.float32)
    # stable descending: sort by (-z) with stable kind keeps low indices first
    order = np.argsort(-z, kind="stable")
    frozen = np.sort(order[: block_length - info_length])
    return frozen.astype(np.int64)
