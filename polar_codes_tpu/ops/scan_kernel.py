"""Pallas TPU kernels for the SCAN soft-output decoder.

Capability target: Scan::decode
(/root/reference/src/polarcode/decoding/scan.cpp:223-307) — functionally
covered by models/scan.py; this file is a performance vehicle, like
ops/fastssc_kernel.py for the hard-output tree.

The XLA SCAN sweep round-trips [B, span] alphas/betas through HBM at every
tree level of every sweep, plus the inter-sweep node memory (the
reference's mOdd/mEven arrays). Here a whole sweep of the tree runs
VMEM-resident per 128-lane batch tile in the [span, B] batch-on-lanes
layout, in two flavors:

- fused: ALL sweeps unrolled inside one kernel — the inter-sweep memory
  never exists in HBM at all; traffic is one [N, B] read + one [N, B]
  write total.
- stepped: one sweep per kernel call with the per-node memory packed into
  a [M, B] buffer (M = sum of half-spans over branch nodes) carried
  between calls — for FastSScanFloat's CRC-gated early exit
  (fastsscan_float.cpp:309-330), which must inspect the codeword between
  sweeps.

Numerics are identical to models/scan.py (same f_minsum on the same
values, elementwise only — no reductions), so interpret mode matches the
XLA path bit-for-bit, +inf rate-0 betas included.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fg import f_minsum
from ..models.tree import CodeNode, NodeKind


def _mem_layout(tree: CodeNode):
    """Offset of each branch node's beta_r row block in the packed [M, B]
    inter-sweep memory buffer (post-order, matching _sweep emission)."""
    offsets = {}
    total = 0

    def walk(node: CodeNode):
        nonlocal total
        if node.kind != NodeKind.BRANCH:
            return
        walk(node.left)
        walk(node.right)
        offsets[id(node)] = total
        total += node.length // 2

    walk(tree)
    return offsets, total


def _sweep(node: CodeNode, alpha, mem, new_mem):
    """One SCAN sweep on [span, B] state (models/scan.py _sweep_node in the
    batch-on-lanes layout). mem/new_mem: dict id(node) -> beta_r [half, B]."""
    if node.kind == NodeKind.RATE0:
        return jnp.full_like(alpha, jnp.inf)
    if node.kind == NodeKind.RATE1:
        return jnp.zeros_like(alpha)
    half = node.length // 2
    a, b = alpha[:half], alpha[half:]
    prev = mem.get(id(node))
    if prev is None:
        prev = jnp.zeros_like(b)
    beta_l = _sweep(node.left, f_minsum(a, b + prev), mem, new_mem)
    beta_r = _sweep(node.right, b + f_minsum(a, beta_l), mem, new_mem)
    new_mem[id(node)] = beta_r
    return jnp.concatenate(
        [f_minsum(beta_l, b + beta_r), beta_r + f_minsum(beta_l, a)], axis=0
    )


def build_scan_kernel(decoder, sweeps: int, batch_tile: int = 128,
                      interpret: bool = False):
    """Fused variant: fn(llr [B, N] f32) -> beta [B, N] after `sweeps`
    sweeps, inter-sweep memory VMEM-resident. B is padded to batch_tile."""
    tree = decoder.tree
    n_len = decoder.block_length
    if tree.kind != NodeKind.BRANCH:
        raise ValueError("degenerate single-leaf tree: use the XLA path")

    def kernel(llr_ref, beta_ref):
        alpha = llr_ref[...]
        mem = {}
        beta = jnp.zeros_like(alpha)
        for _ in range(sweeps):
            new_mem = {}
            beta = _sweep(tree, alpha, mem, new_mem)
            mem = new_mem
        beta_ref[...] = beta

    def fn(llr):
        n_batch = llr.shape[0]
        pad = (-n_batch) % batch_tile
        if pad:
            llr = jnp.concatenate(
                [llr, jnp.zeros((pad, n_len), llr.dtype)]
            )
        grid = ((n_batch + pad) // batch_tile,)
        beta = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_len, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_len, batch_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (n_len, n_batch + pad), jnp.float32
            ),
            interpret=interpret,
        )(llr.T)
        out = beta.T
        if pad:
            out = out[:n_batch]
        return out

    return fn


def build_scan_step_kernel(decoder, batch_tile: int = 128,
                           interpret: bool = False):
    """Stepped variant: fn(llr [B, N], mem [M, B] or None) ->
    (beta [B, N], mem' [M, B]) — one sweep per call, memory carried in the
    kernel-native [M, B] layout (callers treat it as opaque). Also exposes
    fn.mem_rows = M for zero-initialization."""
    tree = decoder.tree
    n_len = decoder.block_length
    if tree.kind != NodeKind.BRANCH:
        raise ValueError("degenerate single-leaf tree: use the XLA path")
    offsets, mem_rows = _mem_layout(tree)

    def kernel(llr_ref, mem_ref, beta_ref, mem_out_ref):
        mem = {}

        # unpack with static slices (offset map is trace-time constant)
        def unpack(node: CodeNode):
            if node.kind != NodeKind.BRANCH:
                return
            unpack(node.left)
            unpack(node.right)
            off = offsets[id(node)]
            half = node.length // 2
            mem[id(node)] = mem_ref[off : off + half]

        unpack(tree)
        new_mem = {}
        beta_ref[...] = _sweep(tree, llr_ref[...], mem, new_mem)
        pieces = [None] * len(offsets)
        order = sorted(offsets.items(), key=lambda kv: kv[1])
        for rank, (node_id, _off) in enumerate(order):
            pieces[rank] = new_mem[node_id]
        mem_out_ref[...] = jnp.concatenate(pieces, axis=0)

    def fn(llr, mem=None):
        n_batch = llr.shape[0]
        pad = (-n_batch) % batch_tile
        if pad:
            llr = jnp.concatenate(
                [llr, jnp.zeros((pad, n_len), llr.dtype)]
            )
        n_pad = n_batch + pad
        if mem is None:
            mem = jnp.zeros((mem_rows, n_pad), jnp.float32)
        grid = (n_pad // batch_tile,)
        beta, mem_out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_len, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mem_rows, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_len, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mem_rows, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_len, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((mem_rows, n_pad), jnp.float32),
            ],
            interpret=interpret,
        )(llr.T, mem)
        out = beta.T
        if pad:
            out = out[:n_batch]
        return out, mem_out

    fn.mem_rows = mem_rows
    return fn
