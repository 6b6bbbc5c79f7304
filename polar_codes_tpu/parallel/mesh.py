"""Mesh construction and the sharded Monte-Carlo counter step.

The simulator's data parallelism is one 1-D mesh axis over the codeword
batch: every device runs the identical trace on its own batch shard with an
independent PRNG key, and the scalar error counters are psum-reduced across
the axis. Codec kernels never communicate — all collective use is confined
to this driver layer (SURVEY.md section 5, "distributed communication").
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 top-level API; experimental path kept as fallback
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def default_mesh(
    n_devices: Optional[int] = None, axis_name: str = "batch"
) -> Mesh:
    """1-D mesh over the first n (default: all) local devices."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else int(n_devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def sharded_counter_step(
    step_fn: Callable[..., Dict[str, jax.Array]],
    mesh: Mesh,
    axis_name: str = "batch",
):
    """Lift a per-device Monte-Carlo step into a mesh-wide one.

    step_fn(key, *args) runs one batch on a single device and returns a dict
    of scalar counters. The lifted function takes a key array with one key
    per mesh device (jax.random.split(key, n_devices)) plus the same *args
    (replicated), runs the step on every device's shard, and returns
    psum-aggregated counters. This is the TPU analogue of the reference's
    per-thread SimulationWorker + shared DataPoint accumulation.
    """

    def inner(keys, *args):
        stats = step_fn(keys[0], *args)
        return {k: jax.lax.psum(v, axis_name) for k, v in stats.items()}

    def lifted(keys, *args):
        in_specs = (P(axis_name),) + tuple(P() for _ in args)
        fn = shard_map(inner, mesh=mesh, in_specs=in_specs, out_specs=P())
        return fn(keys, *args)

    return jax.jit(lifted)
