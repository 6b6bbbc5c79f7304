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
    """Best-of-`tries` seconds per execution of fn(x) on device."""
    if perturb is None:
        perturb = _default_perturb

    def many(x0):
        def body(i, carry):
            acc, cur = carry
            out = fn(cur)
            acc = acc + _outputs_to_scalar(out)
            return acc, perturb(x0, acc)

        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), x0))
        return acc

    jfn = jax.jit(many)
    float(jfn(x))  # compile + warm
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        float(jfn(x))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best
