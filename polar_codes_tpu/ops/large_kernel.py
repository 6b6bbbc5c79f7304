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


def build_masked_scl_chunk_kernel(chunk: int, n_list: int,
                                  int8: bool = False,
                                  batch_tile: int = 128,
                                  interpret: bool = False,
                                  sub: int | None = None):
    """Mask-driven bitwise-SCL chunk as one VMEM kernel.

    Returns fn(llr [B, L, M] f32, mask01 [M] f32, metrics [B, L] f32
    [, sub_cls [M//sub] i32]) -> (bits [B, L, M] bipolar f32, perm
    [B, L] int32, metrics' [B, L]) — the fused rendering of
    LargeSCLDecoder._chunk_scl: every span-1 leaf runs the uniform
    2-candidate prune of LargeSCLDecoder._leaf_bit (frozen bits kill the
    flip candidate with the inactive-slot metric), branches compose the
    path perms exactly like the [L, span, B] subtree kernels
    (ops/scl_kernel_bl.py machinery, reused here).

    sub (e.g. 16) enables SUB-BLOCK CLASS DISPATCH: the recursion stops
    at span `sub` and a runtime `lax.switch` on that sub-block's class
    code (host-classified per chunk, scalar in SMEM, uniform over the
    batch) picks between the per-bit recursion and the SSCL leaf rules
    of the flagship emitter (rate0 / rate1-4cand / rep / spc-8cand,
    _BlEmitter.leaf_*). In the transition band only ~25-40% of sub-blocks
    are truly mixed (the rest are pure), so the dominant per-bit
    fork+prune work is genuinely SKIPPED — scalar conds are real control
    flow on TPU — while the kernel stays mask-generic: ONE Mosaic
    compile serves all chunks (the per-mask-specialized alternative
    needs ~50 kernel compiles at N=32768). Matches the XLA path's
    identical dispatch in LargeSCLDecoder (same leaf rules, same prune
    order), so interpret mode stays bit-for-bit."""
    from types import SimpleNamespace

    from .scl_kernel_bl import _BlEmitter, _take_state, _compose0, _iota
    from ..models.scl import _NEG

    emitter = _BlEmitter(
        SimpleNamespace(list_size=n_list, _int8=int8), jnp.float32
    )
    f_fn, g_fn = emitter.f_fn, emitter.g_fn

    def leaf(llr, mask, metrics):
        """llr [w, 1, B], mask [1, B], metrics [w, B]."""
        work = llr[:, 0, :].astype(jnp.float32)
        mag = jnp.abs(work)
        hard = emitter._hard(llr)
        frozen = mask[0] > 0.0  # [B]
        d_keep = jnp.where(
            frozen[None, :], jnp.minimum(work, 0.0), jnp.zeros_like(mag)
        )
        d_flip = jnp.where(frozen[None, :], jnp.full_like(mag, _NEG), -mag)
        deltas = jnp.stack([d_keep, d_flip], axis=0)  # [2, w, B]
        new_metrics, src, cand = emitter._prune(metrics, deltas)
        hard_g = _take_state(hard, src)
        bits = hard_g * emitter._flip((cand == 1)[:, None, :], hard_g)
        bits = jnp.where(frozen[None, None, :], jnp.ones_like(bits), bits)
        return bits, src, new_metrics

    def ident_perm():
        return _iota((n_list, batch_tile), 0)

    def subblock_switch(cls, llr, mask, metrics):
        """Class-dispatched sub-block: llr [w, sub, B]. Every branch
        returns the same concrete (bits, perm [w, B], metrics) pytree."""

        def concrete(out):
            bits, src, mets = out
            if src is None:
                src = ident_perm()
            return bits, src, mets

        def b_mixed():
            return concrete(node(llr, mask, metrics))

        def b_rate0():
            return concrete(emitter.leaf_rate0(llr, metrics))

        def b_rate1():
            return concrete(emitter.leaf_rate1(llr, metrics))

        def b_rep():
            return concrete(emitter.leaf_rep(llr, metrics))

        def b_spc():
            return concrete(emitter.leaf_spc(llr, metrics))

        return jax.lax.switch(
            cls, [b_mixed, b_rate0, b_rate1, b_rep, b_spc]
        )

    def node(llr, mask, metrics, sub_cls=None, lo=0):
        span = llr.shape[1]
        if span == 1:
            return leaf(llr, mask, metrics)
        if sub is not None and span == sub and sub_cls is not None:
            return subblock_switch(
                sub_cls[lo // sub], llr, mask, metrics
            )
        half = span // 2
        a, b = llr[:, :half, :], llr[:, half:, :]
        left_bits, p_left, metrics = node(
            f_fn(a, b), mask[:half], metrics, sub_cls, lo
        )
        if p_left is not None:
            llr_g = _take_state(llr, p_left)
            a, b = llr_g[:, :half, :], llr_g[:, half:, :]
        right_bits, p_right, metrics = node(
            g_fn(a, b, left_bits), mask[half:], metrics, sub_cls, lo + half
        )
        if p_right is not None:
            left_bits = _take_state(left_bits, p_right)
        perm = _compose0(p_left, p_right)
        bits = jnp.concatenate([left_bits * right_bits, right_bits], axis=1)
        return bits, perm, metrics

    def kernel(*refs):
        if sub is not None:
            sub_cls_ref, llr_ref, mask_ref, met_ref = refs[:4]
            bits_ref, perm_ref, out_met_ref = refs[4:]
            sub_cls = sub_cls_ref
        else:
            llr_ref, mask_ref, met_ref = refs[:3]
            bits_ref, perm_ref, out_met_ref = refs[3:]
            sub_cls = None
        metrics = met_ref[...].T  # [w, B]
        bits, perm, metrics = node(
            llr_ref[...], mask_ref[...], metrics, sub_cls
        )
        if perm is None:
            perm = ident_perm()
        bits_ref[...] = bits
        perm_ref[...] = perm.T
        out_met_ref[...] = metrics.T

    def fn(llr, mask01, metrics, sub_cls=None):
        n_batch = llr.shape[0]
        pad = (-n_batch) % batch_tile
        if pad:
            llr = jnp.concatenate(
                [llr, jnp.zeros((pad,) + llr.shape[1:], llr.dtype)]
            )
            metrics = jnp.concatenate(
                [metrics,
                 jnp.full((pad, n_list), _NEG, metrics.dtype)]
            )
        n_pad = n_batch + pad
        mask_b = jnp.broadcast_to(
            mask01.astype(jnp.float32)[:, None], (chunk, n_pad)
        )
        grid = (n_pad // batch_tile,)
        state_spec = pl.BlockSpec((n_list, chunk, batch_tile),
                                  lambda i: (0, 0, i),
                                  memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec((chunk, batch_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        vec_spec = pl.BlockSpec((batch_tile, n_list), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        in_specs = [state_spec, mask_spec, vec_spec]
        args = [jnp.transpose(llr, (1, 2, 0)).astype(jnp.float32), mask_b,
                metrics]
        if sub is not None:
            if sub_cls is None:
                raise ValueError("sub-block kernel needs sub_cls codes")
            in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
            args.insert(0, sub_cls.astype(jnp.int32))
        bits, perm, out_met = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[state_spec, vec_spec, vec_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n_list, chunk, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, n_list), jnp.int32),
                jax.ShapeDtypeStruct((n_pad, n_list), jnp.float32),
            ],
            interpret=interpret,
        )(*args)
        bits = jnp.transpose(bits, (2, 0, 1))  # [Bp, L, M]
        if pad:
            bits, perm, out_met = (
                bits[:n_batch], perm[:n_batch], out_met[:n_batch]
            )
        return bits, perm, out_met

    return fn


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
