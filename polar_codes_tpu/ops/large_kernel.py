"""Pallas TPU kernel for the scan-over-schedule chunk decoder.

Capability target: the chunk stage of models/large.py (itself the bounded-
compile rendering of FastSscAvxFloat at the reference's benchmark extremes,
main_benchmark.cpp N up to 131072); this file is a performance vehicle.

Why: the generic mask-driven SC chunk (`LargeSCDecoder._chunk_sc`) unrolls
2M-1 f/g/concat steps of tiny [B, <=M] ops inside the `lax.scan` body —
at N=131072, M=512 that is ~2500 sequential VPU ops per scan step whose
fixed per-op latency, not their arithmetic, dominates the decode
(PERF.md: sc_scan rows run at ~2% HBM utilization). Fusing the whole
masked-SC recursion into ONE VMEM-resident kernel per step collapses those
~2500 dispatches into a single one; the frozen mask stays data (a [M, B]
input ref), so the kernel remains chunk-generic and the outer program
stays O(chunk + log N).

Layout: [M, B] batch-on-lanes like the other kernels. The outer scan keeps
its [B, span] buffers; the per-step transpose of one [B, M] block is noise
next to the removed dispatch train.

Numerics: identical ops in identical order to _chunk_sc (same
f_minsum/g_update or the saturating pair, same hard-decision rule), so
interpret mode matches the XLA path bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fg import f_minsum, g_update, f_minsum_sat, g_update_sat


def build_masked_sc_chunk_kernel(chunk: int, int8: bool = False,
                                 batch_tile: int = 128,
                                 interpret: bool = False):
    """Returns fn(llr [B, M] f32, mask01 [M] f32) -> (x [B, M], u [B, M])
    bipolar f32 — the masked-SC chunk decode of LargeSCDecoder._chunk_sc.
    B is padded to batch_tile internally."""
    if int8:
        f_fn, g_fn = f_minsum_sat, g_update_sat
    else:
        f_fn, g_fn = f_minsum, g_update

    def hard(llr):
        if int8:
            return jnp.where(llr < 0, -1.0, 1.0).astype(llr.dtype)
        return jnp.where(jnp.signbit(llr), -1.0, 1.0).astype(llr.dtype)

    def rec(llr, mask):
        """llr [m, B], mask [m, B] (1.0 = frozen) -> (x, u) [m, B]."""
        m = llr.shape[0]
        if m == 1:
            h = hard(llr)
            u = jnp.where(mask > 0.0, jnp.ones_like(h), h)
            return u, u
        half = m // 2
        a, b = llr[:half], llr[half:]
        x_l, u_l = rec(f_fn(a, b), mask[:half])
        x_r, u_r = rec(g_fn(a, b, x_l), mask[half:])
        return (
            jnp.concatenate([x_l * x_r, x_r], axis=0),
            jnp.concatenate([u_l, u_r], axis=0),
        )

    def kernel(llr_ref, mask_ref, x_ref, u_ref):
        x, u = rec(llr_ref[...], mask_ref[...])
        x_ref[...] = x
        u_ref[...] = u

    def fn(llr, mask01):
        n_batch = llr.shape[0]
        pad = (-n_batch) % batch_tile
        if pad:
            llr = jnp.concatenate(
                [llr, jnp.zeros((pad, chunk), llr.dtype)]
            )
        n_pad = n_batch + pad
        mask_b = jnp.broadcast_to(
            mask01.astype(jnp.float32)[:, None], (chunk, n_pad)
        )
        grid = (n_pad // batch_tile,)
        spec = pl.BlockSpec((chunk, batch_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        x, u = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((chunk, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((chunk, n_pad), jnp.float32),
            ],
            interpret=interpret,
        )(llr.T, mask_b)
        return x.T[:n_batch], u.T[:n_batch]

    return fn
