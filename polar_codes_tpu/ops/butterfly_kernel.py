"""Pallas TPU kernel for the polar butterfly encoder.

Capability target: ButterflyFipPacked::encode
(/root/reference/src/polarcode/encoding/butterfly_fip_packed.cpp:45-69) —
functionally already covered by ops/butterfly.py + models/encoder.py; this
kernel is a performance vehicle.

Why: the XLA bipolar encoder round-trips [B, N] float32 state through HBM
at every one of the 10-17 butterfly stages (plus a second systematic pass),
so encode is bandwidth-bound at ~20x the useful traffic. This kernel keeps
one [N, B_tile] block resident in VMEM for ALL stages of BOTH passes:
HBM traffic drops to one uint8 read + one uint8 write of the codeword.

Layout: [N, B_tile] — the batch fills the 128 VPU lanes, the codeword spans
the sublanes. Stage s pairs rows i and i + 2^s; as a shape-split reshape
[N, B] -> [N/(2h), 2, h, B] the pairing never touches the (minor) lane dim,
which Mosaic lowers cleanly. XOR runs as bipolar multiply (VPU-native), the
same trick as ops/butterfly.py.

The systematic re-freeze between the two passes consumes the frozen mask as
a [N, 1] float input ref (Pallas kernels cannot capture array constants).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stages(x, n_len):
    """All log2(N) butterfly stages on [N, B] bipolar floats."""
    n_batch = x.shape[-1]
    h = 1
    while h < n_len:
        x = x.reshape(n_len // (2 * h), 2, h, n_batch)
        upper = x[:, 0] * x[:, 1]
        x = jnp.concatenate([upper[:, None], x[:, 1:2]], axis=1)
        x = x.reshape(n_len, n_batch)
        h *= 2
    return x


def build_encode_kernel(n_len: int, frozen_mask, systematic: bool = True,
                        batch_tile: int = 128, interpret: bool = False):
    """Returns fn: u01 uint8 [B, N] (u-domain bits, frozen rows already 0)
    -> codeword uint8 [B, N]. B must be a multiple of batch_tile.

    frozen_mask: bool [N] (only used when systematic).
    """
    import numpy as np

    # broadcast to the full lane width: unit lane dims are a known Mosaic
    # trouble spot (see profiling/scl_kernel_gen1.py docstrings)
    mask = np.broadcast_to(
        np.asarray(frozen_mask, dtype=np.float32).reshape(n_len, 1),
        (n_len, batch_tile),
    ).copy()

    def kernel(u_ref, mask_ref, out_ref):
        # Mosaic has no direct uint8 -> f32 vector cast (fails on HW with
        # "Unsupported cast"); widen through int32 first.
        u = u_ref[...].astype(jnp.int32).astype(jnp.float32)
        x = 1.0 - 2.0 * u  # [N, B] bipolar
        x = _stages(x, n_len)
        if systematic:
            x = jnp.where(mask_ref[...] > 0.0, 1.0, x)  # re-freeze
            x = _stages(x, n_len)
        out_ref[...] = jnp.signbit(x).astype(jnp.uint8)

    def fn(u01):
        n_batch = u01.shape[0]
        if n_batch % batch_tile:
            raise ValueError(
                f"batch {n_batch} not a multiple of tile {batch_tile}"
            )
        grid = (n_batch // batch_tile,)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_len, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_len, batch_tile), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_len, batch_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_len, n_batch), jnp.uint8),
            interpret=interpret,
        )(u01.T, jnp.asarray(mask))
        return out.T

    return fn
