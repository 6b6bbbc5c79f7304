"""Independent scalar successive-cancellation reference decoder (NumPy).

Textbook recursive min-sum SC, written from the algorithm definition (not
from the reference library) as the correctness anchor for the batched
Fast-SSC/SCL decoders: on tie-free inputs Fast-SSC decisions must equal
plain SC decisions (Sarkis et al., "Fast Polar Decoders: Algorithm and
Implementation").

Also provides a scalar SCL reference with the same path-metric rules as the
production decoder (largest-metric-first, penalty = -|llr| on sign
disagreement) for list-decoder cross-checks.
"""

import numpy as np


def f_minsum(a, b):
    return np.sign(a) * np.sign(b) * np.minimum(np.abs(a), np.abs(b))


def g_fn(a, b, u_left):
    return b + (1.0 - 2.0 * u_left) * a


def sc_decode(llr, frozen_mask):
    """Returns (u_hat, x_hat): u-domain decisions and codeword bits {0,1}."""
    llr = np.asarray(llr, dtype=np.float64)
    n_len = len(llr)
    if n_len == 1:
        if frozen_mask[0]:
            u = 0
        else:
            u = 1 if llr[0] < 0 else 0
        return np.array([u], dtype=np.uint8), np.array([u], dtype=np.uint8)
    half = n_len // 2
    a, b = llr[:half], llr[half:]
    u_left, x_left = sc_decode(f_minsum(a, b), frozen_mask[:half])
    u_right, x_right = sc_decode(g_fn(a, b, x_left), frozen_mask[half:])
    u = np.concatenate([u_left, u_right])
    x = np.concatenate([x_left ^ x_right, x_right])
    return u, x


def scl_decode(llr, frozen_mask, list_size):
    """Scalar CA-ready SCL: returns (u_candidates [L, N], metrics [L]) sorted
    by metric descending. Path metric: penalized by -|llr_i| when the decision
    at bit i contradicts the sign of its decision LLR (LLR-based SCL,
    Balatsoukas-Stimming et al., in the 'higher is better' orientation)."""
    n_len = len(llr)

    paths = [(0.0, [])]  # (metric, u bits so far)

    def decision_llr(channel_llr, u_prefix):
        # compute LLR for next bit given prefix via recursive evaluation
        return _llr_for_bit(np.asarray(channel_llr, np.float64),
                            np.asarray(u_prefix, np.uint8))

    for i in range(n_len):
        new_paths = []
        for metric, prefix in paths:
            l_i = decision_llr(llr, prefix)
            for bit in (0, 1):
                if frozen_mask[i] and bit == 1:
                    continue
                penalty = 0.0
                if (l_i < 0 and bit == 0) or (l_i >= 0 and bit == 1):
                    penalty = -abs(l_i)
                new_paths.append((metric + penalty, prefix + [bit]))
        new_paths.sort(key=lambda t: -t[0])
        paths = new_paths[:list_size]

    u = np.array([p for _, p in paths], dtype=np.uint8)
    metrics = np.array([m for m, _ in paths])
    return u, metrics


def _llr_for_bit(llr, u_prefix):
    """Decision LLR for bit len(u_prefix) under min-sum SC."""
    n_len = len(llr)
    if n_len == 1:
        return llr[0]
    half = n_len // 2
    a, b = llr[:half], llr[half:]
    k = len(u_prefix)
    if k < half:
        return _llr_for_bit(f_minsum(a, b), u_prefix)
    # left half fully decided: re-encode it to partial sums
    x_left = _encode(u_prefix[:half])
    return _llr_for_bit(g_fn(a, b, x_left), u_prefix[half:])


def _encode(u):
    u = np.asarray(u, dtype=np.uint8).copy()
    n_len = len(u)
    s = 1
    while s < n_len:
        for i in range(0, n_len, 2 * s):
            u[i : i + s] ^= u[i + s : i + 2 * s]
        s *= 2
    return u
