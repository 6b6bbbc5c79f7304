"""5G NR ("5G") construction from the TS 38.212 reliability sequence.

Capability parity with /root/reference/src/polarcode/construction/fiveGList.cpp
and /root/reference/python/polar_5g_parameters.py:100-123
(get_polar_5g_positions / get_polar_5g_frozenBitPositions).

For N < 1024 the standard-conformant behavior (which the reference's Python
tooling implements) keeps only sequence entries < N before taking the first
N-K as frozen. The reference's C++ FiveGList::construct takes the first N-K
entries of the full 1024-entry table without filtering, which can emit frozen
positions >= N for sub-1024 codes; we implement the filtered (correct) form.
"""

from __future__ import annotations

import numpy as np

from .nr_sequence import NR_RELIABILITY_SEQUENCE_1024

NR_MAX_BLOCK_LENGTH = 1024


def nr_reliability_sequence(block_length: int = 1024) -> np.ndarray:
    """TS 38.212 polar sequence restricted to indices < block_length.

    Ordered from least to most reliable, a permutation of range(block_length).
    """
    if block_length > NR_MAX_BLOCK_LENGTH:
        raise ValueError("5G standard does not allow for block size N > 1024!")
    n = block_length.bit_length() - 1
    if (1 << n) != block_length:
        raise ValueError(f"block length {block_length} is not a power of 2")
    seq = NR_RELIABILITY_SEQUENCE_1024
    if block_length == NR_MAX_BLOCK_LENGTH:
        return seq.copy()
    return seq[seq < block_length].copy()


def nr_frozen_bits(
    block_length: int, info_length: int, design_snr_db: float = 0.0
) -> np.ndarray:
    """Frozen positions: first N-K entries of the restricted sequence, sorted.

    design_snr_db is ignored (table-based construction), as in the reference.
    """
    if block_length < info_length:
        raise ValueError(f"invalid polar code ({block_length}, {info_length})")
    seq = nr_reliability_sequence(block_length)
    frozen = np.sort(seq[: block_length - info_length])
    return frozen.astype(np.int64)
