"""Device timing that is honest under async dispatch.

The axon-tunneled TPU backend was observed returning from
block_until_ready before execution completed, which makes naive wall-clock
loops report fantasy numbers. The fix: chain `reps` executions of the
function inside ONE jitted fori_loop with a data dependency between
iterations (so XLA cannot hoist the body), reduce the outputs to a scalar,
and fetch that scalar — the fetch cannot complete before all work ran.
Per-iteration time = total / reps; the host round-trip amortizes away.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _outputs_to_scalar(out) -> jnp.ndarray:
    total = jnp.float32(0)
    for leaf in jax.tree.leaves(out):
        total = total + jnp.sum(jnp.asarray(leaf).astype(jnp.float32))
    return total


def _default_perturb(x, acc):
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x + jnp.asarray(1e-12, x.dtype) * acc.astype(x.dtype)
    # integer/bool inputs: flip nothing but keep the dependency via a
    # data-dependent zero (acc != acc is always False -> xor 0)
    zero = (acc != acc).astype(x.dtype)
    return x ^ zero if x.dtype != jnp.bool_ else x ^ (acc != acc)


def time_device_fn(
    fn: Callable,
    x,
    reps: int = 10,
    tries: int = 3,
    perturb: Callable = None,
) -> float:
    """Seconds per execution of fn(x) on device, fixed-overhead-corrected.

    The tunneled backend adds a large constant cost (~tens of ms) to every
    jitted call, so a single timed call overstates small kernels wildly.
    We run the chained loop at `reps` and `2*reps` iterations and take the
    slope — the constant cancels exactly."""
    if perturb is None:
        perturb = _default_perturb

    def make(n):
        def many(x0):
            def body(i, carry):
                acc, cur = carry
                out = fn(cur)
                acc = acc + _outputs_to_scalar(out)
                return acc, perturb(x0, acc)

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x0))
            return acc

        return jax.jit(many)

    # pilot: upper-bound estimate including the constant call overhead
    pilot = make(reps)
    float(pilot(x))  # compile + warm
    t0 = time.perf_counter()
    float(pilot(x))
    est = (time.perf_counter() - t0) / reps
    # choose reps so the differenced window is ~0.2 s — far above the
    # per-call jitter of the constant overhead (capped: long device loops
    # have wedged the tunneled backend)
    reps = max(reps, min(512, int(0.2 / max(est, 1e-7))))

    f1, f2 = make(reps), make(2 * reps)
    float(f1(x))
    float(f2(x))  # compile + warm both
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        float(f1(x))
        t1 = time.perf_counter()
        float(f2(x))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / reps)
    return max(best, 1e-9)
