"""Pallas TPU kernel for the Fast-SSC (L=1) decoder.

Capability target: FastSscAvxFloat::decode
(/root/reference/src/polarcode/decoding/fastssc_avx_float.cpp) —
functionally covered by models/fastssc.py; this kernel is a performance
vehicle. The XLA tree decode round-trips [B, span] state through HBM at
every tree level; here an entire span<=kernel_span subtree (f/g recursion
plus the Rate0/Rate1/Rep/SPC leaf shortcuts) runs VMEM-resident per
128-lane batch tile, in the same [span, B] batch-on-lanes layout as
ops/scl_kernel_bl.py. Levels above kernel_span run as plain XLA glue.

state_dtype=bfloat16 packs the LLR/bit state two-per-word in (16, 128)
vreg tiles (Rep sums still accumulate in f32 so the decision threshold
keeps full precision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fg import f_minsum, f_minsum_bits, g_update, f_minsum_sat, g_update_sat
from ..models.tree import CodeNode, NodeKind


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _hard_sign(llr):
    """Bipolar sign-bit decision (-0.0 -> -1), in the state dtype."""
    return jnp.where(jnp.signbit(llr), -1.0, 1.0).astype(llr.dtype)


def _hard_char(llr):
    """Char-mode decision: 0 decides bit 0 (fip_char; int-valued state)."""
    return jnp.where(llr < 0, -1.0, 1.0).astype(llr.dtype)


def _zero_r(a, b):
    """ZeroR g with all-+1 left bits: plain b + a (no saturation — the
    float shortcut; the char path saturates via its g_fn instead)."""
    return b + a


class _Ops:
    """Per-dtype-family arithmetic: float (sign-bit rule, plain min-sum)
    or char (0 -> bit 0, saturating fip_char ops on integer-valued
    state)."""

    def __init__(self, char: bool, state_dtype=jnp.float32):
        self.char = char
        if char:
            self.f_fn, self.g_fn = f_minsum_sat, g_update_sat
            self.hard = _hard_char
            self.zero_r = lambda a, b: g_update_sat(a, b, jnp.ones_like(a))
        elif jnp.dtype(state_dtype) == jnp.float32:
            # bitcast f: the reference's sign-XOR formulation, cheaper
            # in-kernel (see fg.f_minsum_bits; zero-LLR caveat does not
            # apply to channel-LLR trees). f32 only: the i32 bitcast
            # does not exist for 16-bit state.
            self.f_fn, self.g_fn = f_minsum_bits, g_update
            self.hard = _hard_sign
            self.zero_r = _zero_r
        else:
            self.f_fn, self.g_fn = f_minsum, g_update
            self.hard = _hard_sign
            self.zero_r = _zero_r


def _leaf(node: CodeNode, llr, ops: _Ops):
    """Fast-SSC leaf shortcuts on [span, B] state.

    Leaves compute in float32 regardless of the state dtype: comparison
    masks over bfloat16 vectors trip Mosaic relayout bugs on real HW
    ("Invalid relayout ... vector<4x128xi1>" — interpret mode accepts
    them), and every char value is an integer that f32 represents
    exactly, so the result is value-identical."""
    sdt = llr.dtype
    llr = llr.astype(jnp.float32)
    kind = node.kind
    if kind == NodeKind.RATE0:
        return jnp.ones(llr.shape, sdt)
    if kind == NodeKind.RATE1:
        return ops.hard(llr).astype(sdt)
    if kind == NodeKind.REP:
        # the rep sum does NOT saturate (fastssc int8 sums in int32);
        # f32 accumulation is exact for both families
        s = jnp.sum(llr, axis=0, keepdims=True)
        return jnp.broadcast_to(ops.hard(s), llr.shape).astype(sdt)
    # SPC: hard decisions, flip the weakest magnitude if parity is odd
    hard = ops.hard(llr)
    mag = jnp.abs(llr)
    neg = jnp.sum(jnp.where(hard < 0, 1, 0), axis=0)  # [B]
    parity_odd = neg % 2 == 1
    m = jnp.min(mag, axis=0)  # [B]
    iota = _iota(mag.shape, 0)
    span = mag.shape[0]
    weakest = jnp.min(jnp.where(mag == m[None, :], iota, span), axis=0)
    flip = (iota == weakest[None, :]) & parity_odd[None, :]
    return (hard * jnp.where(flip, -1.0, 1.0)).astype(sdt)


def _emit(node: CodeNode, llr, ops: _Ops):
    """Recursive subtree body; llr [span, B] bipolar-LLR floats."""
    if node.kind != NodeKind.BRANCH:
        return _leaf(node, llr, ops)
    half = node.length // 2
    a, b = llr[:half], llr[half:]
    if node.left.kind == NodeKind.RATE0:
        # ZeroR shortcut: left bits all +1 -> g degenerates to b + a
        right = _emit(node.right, ops.zero_r(a, b), ops)
        return jnp.concatenate([right, right], axis=0)
    left = _emit(node.left, ops.f_fn(a, b), ops)
    right = _emit(node.right, ops.g_fn(a, b, left), ops)
    return jnp.concatenate([left * right, right], axis=0)


def build_fs_hybrid_decode(decoder, batch_tile: int = 128,
                           kernel_span: int = 1024,
                           interpret: bool = False,
                           state_dtype=jnp.float32):
    """Returns fn: llr [B, N] float -> codeword bits uint8 [B, N].

    Matches models/fastssc.py FastSSCDecoder.decode_to_codeword (float32
    semantics) bit-for-bit on tie-free inputs; subtree kernels below
    kernel_span, XLA recursion above."""
    n_len = decoder.block_length
    char = jnp.dtype(decoder.dtype) == jnp.dtype(jnp.int8)
    if char:
        # char values are integers in [-254, 254]: exact in bf16, so the
        # packed state keeps exact FastSscFipChar value parity
        state_dtype = jnp.dtype(jnp.bfloat16)
    else:
        state_dtype = jnp.dtype(state_dtype)
    ops = _Ops(char, state_dtype)
    subtree_cache = {}

    def subtree_call(node: CodeNode):
        fn = subtree_cache.get(id(node))
        if fn is not None:
            return fn
        span = node.length

        def kernel(llr_ref, out_ref):
            # signbit on bf16 vectors trips Mosaic on HW; f32 is exact
            out_ref[...] = jnp.signbit(
                _emit(node, llr_ref[...], ops).astype(jnp.float32)
            ).astype(jnp.uint8)

        def kernel_bits(llr_ref, out_ref):
            out_ref[...] = _emit(node, llr_ref[...], ops)

        is_root = span == n_len

        def call(llr):
            n_batch = llr.shape[-1]
            grid = (n_batch // batch_tile,)
            return pl.pallas_call(
                kernel if is_root else kernel_bits,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((span, batch_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((span, batch_tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (span, n_batch),
                    jnp.uint8 if is_root else state_dtype,
                ),
                interpret=interpret,
            )(llr)

        subtree_cache[id(node)] = call
        return call

    def xla_node(node: CodeNode, llr):
        """[span, B] levels above kernel_span (XLA); kernels below."""
        if node.length <= kernel_span:
            return subtree_call(node)(llr)
        if node.kind != NodeKind.BRANCH:
            return _leaf(node, llr, ops)
        half = node.length // 2
        a, b = llr[:half], llr[half:]
        if node.left.kind == NodeKind.RATE0:
            right = xla_node(node.right, ops.zero_r(a, b))
            return jnp.concatenate([right, right], axis=0)
        left = xla_node(node.left, ops.f_fn(a, b))
        right = xla_node(node.right, ops.g_fn(a, b, left))
        return jnp.concatenate([left * right, right], axis=0)

    def run(llr):
        llr = llr.astype(state_dtype)
        n_batch = llr.shape[0]
        pad = (-n_batch) % batch_tile
        if pad:
            llr = jnp.concatenate(
                [llr, jnp.zeros((pad, n_len), llr.dtype)]
            )
        x = xla_node(decoder.tree, llr.T)
        if x.dtype != jnp.uint8:  # root above kernel_span: sign in XLA
            x = jnp.signbit(x).astype(jnp.uint8)
        out = x.T
        if pad:
            out = out[:n_batch]
        return out

    return run
