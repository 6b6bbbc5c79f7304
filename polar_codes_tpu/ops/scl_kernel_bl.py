"""Pallas SCL subtree kernels, batch-on-lanes layout.

Second-generation fused SCL kernel (capability target: the decode hot loop
of /root/reference/src/polarcode/decoding/scl_avx_float.cpp:353-586,
already covered functionally by models/scl.py — this file is purely a
performance vehicle).

Why a redesign: the first kernel (profiling/scl_kernel_gen1.py, demoted
out of the production package as a measured A/B artifact) uses [B_tile, L, span]
blocks — span lives on the VPU lanes, the list axis on sublanes, and the
batch is an unvectorized outer dimension. Measured on v5e that hybrid runs
at 26 ms per 1024-block batch (vs 0.90 ms for the XLA path): at deep nodes
span is 4..16 so >90% of the 128 lanes idle, and every op loops 64x over
the batch. This kernel flips the layout to [L, span, B_tile] with
B_tile=128 — the batch fills the lanes at EVERY tree node, span sits on
sublanes, and the short list axis is the outer loop. Micro-probes confirm
Mosaic lowers the three layout-critical patterns (sublane-broadcast
selects, iota-argmin over sublanes, sublane reductions + 2-D transposes)
cleanly in this orientation.

Like the first kernel it is a *subtree* kernel: one Pallas program fuses an
entire span<=kernel_span subtree (f/g recursion, leaf candidate expansion,
iterative-extraction pruning, select-chain path forks) with all state in
VMEM; the few wide levels above run as plain XLA ops in the same
[L, span, B] layout (models/scl.py batch_last machinery), where XLA is
already efficient. Whole-tree kernels are deliberately avoided: Mosaic
compile time is superlinear in program size (>9 min at N=1024).

Numerics: identical candidate sets, prune order, and tie-breaking as
models/scl.py (flat l*C+c candidate codes extracted iteratively match
lax.top_k's stable order). Interpret mode matches the XLA batch_last path
bit-for-bit; compiled on TPU, float reassociation can perturb metrics at
~1e-7 relative, which only matters for exactly-tied paths.

State layout: LLRs in the requested state dtype (f32 default; bf16
measured slower — see PERF.md), decision bits as {0,1} int8 everywhere —
1/4 the f32 vreg/HBM traffic on the path-fork select chains, the combine
concats (XOR), and the downstream CRC selection, at the cost of one
int8→f32 convert+fma per g call. Mosaic constraints that shaped this
(profiling/bf16_probe.py): bipolar ±1 int8 products crash at narrow
spans, u8→f32 casts are unsupported, XOR and int8 selects/casts are
clean.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fg import f_minsum, g_update, f_minsum_sat, g_update_sat
from .fg import f_minsum_bits as _f_minsum_bits
from ..models.tree import CodeNode, NodeKind
from ..models.scl import (
    _SPC_FLIPS_EVEN,
    _SPC_FLIPS_ODD,
    _SPC_M0_EVEN,
    _SPC_T,
    _NEG,
)


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _oddeven_pairs(n: int):
    """Batcher odd-even mergesort compare-exchange pairs (i < j) for n a
    power of two. 1 pair at n=2, 5 at n=4, 19 at n=8, 63 at n=16."""

    def merge(lo, hi, r):
        step = r * 2
        if step < hi - lo:
            yield from merge(lo, hi, step)
            yield from merge(lo + r, hi, step)
            for i in range(lo + r, hi - r, step):
                yield (i, i + r)
        else:
            yield (lo, lo + r)

    def sort(lo, hi):
        if hi - lo >= 1:
            mid = lo + (hi - lo) // 2
            yield from sort(lo, mid)
            yield from sort(mid + 1, hi)
            yield from merge(lo, hi, 1)

    assert n & (n - 1) == 0, n
    return list(sort(0, n - 1))


def _rep0(x, c):
    """jnp.repeat(x, c, axis=0) as a static concat of slices (Mosaic-safe).

    The ("rep", c) perm of progressive list widening: each of the w live
    paths forks into c children, so the gather is a fixed tiling."""
    if c == 1:
        return x
    return jnp.concatenate(
        [x[k : k + 1] for k in range(x.shape[0]) for _ in range(c)], axis=0
    )


def _take_state(x, src):
    """Gather [w_in, S, B] state along the path axis by src [w_out, B]:
    out[l] = x[src[l, b]] — a select chain (no gather op in Mosaic; an
    O(w log w) hypercube pull network is NOT valid here: each partner
    row's value reflects the partner's own src history, not this row's).
    src may also be a static ("rep", c) widening perm."""
    if src is None:
        return x
    if isinstance(src, tuple):
        return _rep0(x, src[1])
    w_in = x.shape[0]
    out = jnp.broadcast_to(x[0:1], src.shape[:1] + x.shape[1:])
    for k in range(1, w_in):
        out = jnp.where((src == k)[:, None, :], x[k : k + 1], out)
    return out


def _take_vec(v, src):
    """Gather [w_in, B] per-path values by src [w_out, B]:
    out[l, b] = v[src[l, b], b]. Tuple src = static widening tile."""
    if src is None:
        return v
    if isinstance(src, tuple):
        return _rep0(v, src[1])
    w_in = v.shape[0]
    out = jnp.broadcast_to(v[0:1], src.shape)
    for k in range(1, w_in):
        out = jnp.where(src == k, v[k : k + 1], out)
    return out


def _compose0(p_early, p_late):
    """Composition of path-axis perms ([w, B] arrays or ("rep", c) tuples):
    maps final slots to the slots before p_early (models/scl.py
    _compose_perms, in the [list-first, B] layout)."""
    if p_early is None:
        return p_late
    if p_late is None:
        return p_early
    if isinstance(p_early, tuple):
        if isinstance(p_late, tuple):
            return ("rep", p_early[1] * p_late[1])
        return p_late // p_early[1]
    if isinstance(p_late, tuple):
        return _rep0(p_early, p_late[1])
    return _take_vec(p_early, p_late)


class _BlEmitter:
    """Emits the kernel body for one subtree; state layout [L, S, B].

    state_dtype=bfloat16 keeps LLR/bit state packed two-per-word in the
    (16, 128) vreg tiles — one VPU instruction then processes twice the
    elements of the dominant select-chain/f/g passes. Path metrics and
    candidate deltas stay float32 (sums are cast up before accumulation),
    so pruning order differs from f32 only by bf16 rounding of the state
    values themselves."""

    def __init__(self, decoder, state_dtype=jnp.float32, bitplane=False,
                 merge_prune=False):
        self.dec = decoder
        self.n_list = decoder.list_size
        self.sdt = jnp.dtype(state_dtype)
        # merge_prune=True: top-L extraction via the sorted-heads merge
        # (_prune_merge) instead of L iterative max-extract rounds over
        # the full [C, w, B] candidate tensor. Identical extraction order.
        self.merge_prune = bool(merge_prune)
        # bitplane=True: decision bits live as ONE i32 word per (span,
        # lane) with the path axis packed into bitplanes. Path-fork
        # gathers become w variable shifts (out_l = (word >> src[l]) & 1,
        # measured 2.5x faster than the w*(w-1) select chain on v5e —
        # profiling/bitplane_probe.py), ancestor combines become a single
        # XOR instead of w bipolar products, and the bit state's vreg
        # footprint drops w-fold. Values are exactly the {0,1} bits of
        # the bipolar formulation; metrics/prune order are untouched.
        self.bitplane = bool(bitplane)
        # int8 (SclFipChar) mode: saturating f/g; every value is an integer
        # in [-254, 254], exact in bf16, so the packed state keeps exact
        # fip_char value parity
        self.int8 = bool(getattr(decoder, "_int8", False))
        # decision bits live as {0,1} int8 at spans >= 32 (the int8
        # sublane tile): 1/4 the vreg traffic of f32 on the path-fork
        # select chains, combine concats (XOR), and the downstream CRC
        # selection. Below span 32 they stay bipolar in the state dtype —
        # Mosaic rejects int8 selects at sub-tile spans ("Invalid
        # relayout ... vector<8x16x128xi1>: (8,128) -> (32,128)") and the
        # narrow levels are cheap anyway. g converts an int8 bits operand
        # to ±1 (one convert+fma over the half-span — far cheaper than
        # the select passes the int8 state saves).
        if self.int8:
            def g01_sat(a, b, bits):
                u = self._g_bipolar(bits, a.dtype)
                return g_update_sat(a, b, u)

            self.f_fn, self.g_fn = f_minsum_sat, g01_sat
        elif self.sdt != jnp.float32:
            # bf16 storage, f32 ALU: Mosaic crashes on jnp.sign (and
            # bool-xor select rewrites) over bf16 vectors on real HW
            # (profiling/bf16_probe.py: `fg`/`sign` FAIL, `fg_f32` ok).
            # The state arrays — and the dominant select-chain/slice/
            # concat traffic on them — stay two-per-word bf16; only the
            # f/g arithmetic round-trips through f32, exactly like the
            # saturating char ops.
            sdt = self.sdt

            def f_bf16(a, b):
                return f_minsum(
                    a.astype(jnp.float32), b.astype(jnp.float32)
                ).astype(sdt)

            # g is mul+add only (b + u*a, u = ±1): pure bf16 is Mosaic-
            # safe and matches the XLA bf16 path's own g rounding
            def g01_bf16(a, b, bits):
                return g_update(a, b, self._g_bipolar(bits, a.dtype))

            self.f_fn, self.g_fn = f_bf16, g01_bf16
        else:
            def g01_f32(a, b, bits):
                return g_update(a, b, self._g_bipolar(bits, a.dtype))

            self.f_fn, self.g_fn = _f_minsum_bits, g01_f32

    # {0,1} int8 <-> bipolar state-dtype bridges (span >= 32 only)
    _BITS_I8_SPAN = 32

    @staticmethod
    def _g_bipolar(bits, dtype):
        """g's bits operand as bipolar ±1 in the LLR dtype: identity for
        narrow (bipolar state-dtype) bits, convert+fma for int8 {0,1}."""
        if bits.dtype != jnp.int8:
            return bits.astype(dtype)
        u = 1.0 - 2.0 * bits.astype(jnp.float32)
        return u.astype(dtype)

    @staticmethod
    def _to01(bits_bip):
        """Bipolar ±1 (f32/bf16) -> {0,1} int8. The select runs in i32
        (mask and operands share the (8,128) tiling) and casts down —
        the Mosaic-clean pattern (probe i8_g)."""
        work = bits_bip
        if work.dtype != jnp.float32:
            work = work.astype(jnp.float32)
        return jnp.where(work < 0, 1, 0).astype(jnp.int8)

    # -- pruning -------------------------------------------------------------

    def _prune(self, metrics, deltas):
        """metrics [w, B], deltas [C, w, B] -> (metrics' [w', B],
        src ([w', B] or ("rep", C)), cand [w', B]).

        Progressive widening: while w*C <= L nothing is pruned — every
        candidate survives in l-major order (new slot l*C + c), the perm is
        the static ("rep", C) tile and the candidate ids are iota % C, so
        no extraction runs at all (models/scl.py _prune parity). Past L:
        iterative max extraction over the C*w candidates with flat code
        l*C + c — the same order lax.top_k uses on the XLA path's
        [..., w*C] flattening, so tie-breaking matches exactly. L rounds of
        (max, first-argmax, mask); everything lane-parallel over B."""
        n_list, n_cand = self.n_list, deltas.shape[0]
        width = metrics.shape[0]
        cand = metrics[None, :, :] + deltas  # [C, w, B]
        if width * n_cand <= n_list:
            new_metrics = jnp.concatenate(
                [cand[c : c + 1, l] for l in range(width)
                 for c in range(n_cand)], axis=0,
            )  # [w*C, B], l-major
            cand_id = _iota(new_metrics.shape, 0) % n_cand
            return new_metrics, ("rep", n_cand), cand_id
        if self.merge_prune:
            # bitonic needs pow2 fold/merge lengths; widths are products
            # of pow2 candidate counts clamped at L, so the fallback only
            # runs for non-pow2 list sizes
            if width & (width - 1) == 0 and n_list & (n_list - 1) == 0:
                return self._prune_bitonic(cand, n_cand, width)
            return self._prune_merge(cand, n_cand, width)
        code = _iota(cand.shape, 1) * n_cand + _iota(cand.shape, 0)
        total = width * n_cand
        cur = cand
        vals, codes = [], []
        for _ in range(n_list):
            v = jnp.max(jnp.max(cur, axis=0), axis=0)  # [B]
            eq = cur == v[None, None, :]
            i = jnp.min(jnp.min(jnp.where(eq, code, total), axis=0), axis=0)
            vals.append(v)
            codes.append(i)
            cur = jnp.where(code == i[None, None, :], _NEG, cur)
        new_metrics = jnp.stack(vals, axis=0)  # [L, B]
        idx = jnp.stack(codes, axis=0)
        return new_metrics, idx // n_cand, idx % n_cand

    def _prune_merge(self, cand, n_cand, width):
        """Sorted-heads merge extraction (the L>=16 extraction-floor fix).

        Each path's C candidates are first sorted descending by
        (value, flat-code-ascending) with a Batcher network — a unique
        total order, so the result is the stable-descending order the
        flat l*C+c tie rule needs. Top-L extraction is then an L-round
        heads merge: take the max over the w per-path heads (smallest
        flat code among ties — equivalent to the iterative rule, since
        within a path the tied candidate with the smallest code IS the
        head), then shift only the winning path's list down by one. Per
        round: one [w, B] max + argmin and ONE masked-select pass over
        [C, w, B], vs the iterative extraction's ~5 full [C, w, B]
        passes (max, eq, where-code, min, mask) — the O(C*w) -> O(w)
        reduction scoped in scl_avx_float.cpp:353-586 terms as the
        sorted-candidate merge the reference's trackingSorter implies."""
        n_list = self.n_list
        total = width * n_cand
        code = _iota(cand.shape, 1) * n_cand + _iota(cand.shape, 0)
        vals = [cand[c] for c in range(n_cand)]  # each [w, B]
        codes = [code[c] for c in range(n_cand)]
        m = 1 << (n_cand - 1).bit_length()  # network size (pow2 pad)
        for p in range(n_cand, m):
            vals.append(jnp.full_like(vals[0], _NEG))
            codes.append(jnp.full_like(codes[0], total + p))
        for i, j in _oddeven_pairs(m):
            vi, vj = vals[i], vals[j]
            ci, cj = codes[i], codes[j]
            swap = (vi < vj) | ((vi == vj) & (ci > cj))
            vals[i] = jnp.where(swap, vj, vi)
            vals[j] = jnp.where(swap, vi, vj)
            codes[i] = jnp.where(swap, cj, ci)
            codes[j] = jnp.where(swap, ci, cj)
        s_val = jnp.stack(vals, axis=0)  # [C, w, B] descending per path
        s_code = jnp.stack(codes, axis=0)
        # exhausted-list sentinels: value _NEG (same floor the iterative
        # mask uses), code `total` (loses every argmin to a real code)
        sent_v = jnp.full_like(s_val[:1], _NEG)
        sent_c = jnp.full_like(s_code[:1], total)
        out_v, out_c = [], []
        for _ in range(n_list):
            h_v, h_c = s_val[0], s_code[0]  # [w, B] current heads
            v = jnp.max(h_v, axis=0)  # [B]
            i = jnp.min(jnp.where(h_v == v[None, :], h_c, total), axis=0)
            out_v.append(v)
            out_c.append(i)
            win = (h_c == i[None, :])[None, :, :]  # [1, w, B]
            s_val = jnp.where(
                win, jnp.concatenate([s_val[1:], sent_v], axis=0), s_val
            )
            s_code = jnp.where(
                win, jnp.concatenate([s_code[1:], sent_c], axis=0), s_code
            )
        new_metrics = jnp.stack(out_v, axis=0)  # [L, B]
        # a sentinel can only be extracted in degenerate all-dead rounds
        # (metrics at the _NEG floor); clamp so src/cand stay in range
        idx = jnp.minimum(jnp.stack(out_c, axis=0), total - 1)
        return new_metrics, idx // n_cand, idx % n_cand

    @staticmethod
    def _rev0(x):
        """Static reverse along axis 0 (concat of row slices — no
        lax.rev, which Mosaic may not lower)."""
        return jnp.concatenate(
            [x[i : i + 1] for i in reversed(range(x.shape[0]))], axis=0
        )

    @staticmethod
    def _bitonic_layer(v, c, s):
        """One descending bitonic-merge layer at stride s: within each
        2s-row block, compare-exchange row i with row i+s keeping the
        (value desc, code asc)-larger element at the low index."""
        parts_v, parts_c = [], []
        for i in range(0, v.shape[0], 2 * s):
            vlo, vhi = v[i : i + s], v[i + s : i + 2 * s]
            clo, chi = c[i : i + s], c[i + s : i + 2 * s]
            swap = (vlo < vhi) | ((vlo == vhi) & (clo > chi))
            parts_v += [jnp.where(swap, vhi, vlo),
                        jnp.where(swap, vlo, vhi)]
            parts_c += [jnp.where(swap, chi, clo),
                        jnp.where(swap, clo, chi)]
        return (jnp.concatenate(parts_v, axis=0),
                jnp.concatenate(parts_c, axis=0))

    def _prune_bitonic(self, cand, n_cand, width):
        """Top-L extraction as a bitonic merge tree — the log-depth form
        of the sorted-heads merge. Per-path candidate lists are sorted
        descending by the (value, flat-code-ascending) total order
        (Batcher network), then pairwise-merged along the path axis
        (list i with list i + P/2 — static contiguous halves, no
        strided slicing for Mosaic), truncating every merged pair to L:
        top-L of truncated sorted prefixes is the global top-L. The
        final list is the full descending (value, code) order, i.e.
        EXACTLY the iterative-extraction / lax.top_k order, reached in
        O(log w * log L) compare-exchange layers instead of L serial
        max-extract rounds (each with cross-sublane reductions) — the
        extraction depth at L=32 drops ~10x."""
        n_list = self.n_list
        total = width * n_cand
        code = _iota(cand.shape, 1) * n_cand + _iota(cand.shape, 0)
        vals = [cand[k] for k in range(n_cand)]  # each [w, B]
        codes = [code[k] for k in range(n_cand)]
        m = 1 << (n_cand - 1).bit_length()
        for _ in range(n_cand, m):
            vals.append(jnp.full_like(vals[0], _NEG))
            codes.append(jnp.full_like(codes[0], total))
        for i, j in _oddeven_pairs(m):
            vi, vj = vals[i], vals[j]
            ci, cj = codes[i], codes[j]
            swap = (vi < vj) | ((vi == vj) & (ci > cj))
            vals[i] = jnp.where(swap, vj, vi)
            vals[j] = jnp.where(swap, vi, vj)
            codes[i] = jnp.where(swap, cj, ci)
            codes[j] = jnp.where(swap, ci, cj)
        v = jnp.stack(vals, axis=0)  # [m, w, B] descending per path
        c = jnp.stack(codes, axis=0)
        while v.ndim == 3 and v.shape[1] > 1:
            p_half = v.shape[1] // 2
            # a descending ++ reversed(b descending) is bitonic
            v = jnp.concatenate([v[:, :p_half], self._rev0(v[:, p_half:])],
                                axis=0)
            c = jnp.concatenate([c[:, :p_half], self._rev0(c[:, p_half:])],
                                axis=0)
            if p_half == 1:  # drop the path axis: [len, 1, B] vregs tile
                v, c = v[:, 0], c[:, 0]  # (1, B) and waste 7/8 sublanes
            s = v.shape[0] // 2
            while s >= 1:
                v, c = self._bitonic_layer(v, c, s)
                s //= 2
            if v.shape[0] > n_list:
                v, c = v[:n_list], c[:n_list]
        if v.ndim == 3:  # width == 1: single sorted list, no merging ran
            v, c = v[:, 0], c[:, 0]
        new_metrics = v[:n_list]
        idx = jnp.minimum(c[:n_list], total - 1)
        return new_metrics, idx // n_cand, idx % n_cand

    # -- bitplane helpers ----------------------------------------------------
    # Packed bit words are [S, B] int32; plane l holds path l's {0,1} bit.
    # Only shifts/and/or/xor touch them — no selects, the ops Mosaic
    # vectorizes at any span (profiling/bitplane_probe.py).

    @staticmethod
    def _pack01(b01):
        """[w, S, B] int32 {0,1} -> packed [S, B] int32."""
        acc = b01[0]
        for l in range(1, b01.shape[0]):
            acc = acc | (b01[l] << l)
        return acc

    @staticmethod
    def _pack_mask(mask):
        """[w, S, B] bool -> packed [S, B] int32 (1 bits where True)."""
        return _BlEmitter._pack01(jnp.where(mask, 1, 0))

    @staticmethod
    def _take_packed(packed, src, w_out):
        """Path-fork gather on a packed word: out plane l = in plane
        src[l, b] — w variable shifts instead of a select chain. src may
        be a static ("rep", c) widening perm (constant shifts)."""
        if src is None:
            return packed
        if isinstance(src, tuple):
            c = src[1]
            acc = packed & 1
            for l in range(1, w_out):
                acc = acc | (((packed >> (l // c)) & 1) << l)
            return acc
        acc = (packed >> src[0][None, :]) & 1
        for l in range(1, w_out):
            acc = acc | (((packed >> src[l][None, :]) & 1) << l)
        return acc

    @staticmethod
    def _packed_planes(packed, w):
        """Packed word -> [w, S, B] int32 {0,1} planes."""
        return jnp.stack([(packed >> l) & 1 for l in range(w)], axis=0)

    def _packed_bipolar(self, packed, w, dtype):
        """Packed word -> [w, S, B] bipolar ±1 in `dtype` (g's operand)."""
        planes = self._packed_planes(packed, w)
        u = (1 - 2 * planes).astype(jnp.float32)
        return u.astype(dtype)

    def _hard01(self, llr):
        """{0,1} int32 hard decisions, matching _hard's sign rule."""
        if self.int8:
            return jnp.where(llr < 0, 1, 0)
        return jnp.where(jnp.signbit(llr), 1, 0)

    # -- leaf helpers --------------------------------------------------------

    def _hard(self, llr):
        if self.int8:
            # int-valued storage decides 0 -> bit 0 (fip_char; matches
            # SCLDecoder._hard's `llr < 0` rule, not the f32 sign bit)
            return jnp.where(llr < 0, -1.0, 1.0).astype(llr.dtype)
        return jnp.where(jnp.signbit(llr), -1.0, 1.0).astype(llr.dtype)

    def _flip(self, mask, like):
        """Bipolar flip factors in the state dtype."""
        one = jnp.asarray(1.0, like.dtype)
        return jnp.where(mask, -one, one)

    @staticmethod
    def _min0sum(llr):
        # metric-domain sums accumulate in f32 regardless of state dtype
        return jnp.sum(
            jnp.minimum(llr, 0.0).astype(jnp.float32), axis=1
        )  # [L, B]

    @staticmethod
    def _max0sum(llr):
        return jnp.sum(jnp.maximum(llr, 0.0).astype(jnp.float32), axis=1)

    @staticmethod
    def _weakest(mag, count):
        """count smallest (as f32) + first-indices along [L, S, B] span."""
        span = mag.shape[1]
        iota = _iota(mag.shape, 1)
        big = jnp.asarray(jnp.inf, mag.dtype)
        cur = mag
        ms, is_ = [], []
        for _ in range(count):
            m = jnp.min(cur, axis=1)  # [L, B]
            i = jnp.min(jnp.where(cur == m[:, None, :], iota, span), axis=1)
            ms.append(m.astype(jnp.float32))
            is_.append(i)
            cur = jnp.where(iota == i[:, None, :], big, cur)
        return ms, is_

    # -- leaves --------------------------------------------------------------

    def leaf_rate0(self, llr, metrics):
        if self.bitplane:
            zeros = jnp.zeros(llr.shape[1:], jnp.int32)
            return zeros, None, metrics + self._min0sum(llr)
        return jnp.ones_like(llr), None, metrics + self._min0sum(llr)

    def leaf_rate1(self, llr, metrics):
        span = llr.shape[1]
        # bitplane mode decides via _hard01 in both branches; keep the
        # bipolar hard decision out of that trace entirely
        hard = None if self.bitplane else self._hard(llr)
        mag = jnp.abs(llr)
        if span == 1:
            m0 = mag[:, 0, :].astype(jnp.float32)  # [L, B]
            deltas = jnp.stack([jnp.zeros_like(m0), -m0], axis=0)
            new_metrics, src, cand = self._prune(metrics, deltas)
            if self.bitplane:
                w_out = new_metrics.shape[0]
                hard_p = self._take_packed(
                    self._pack01(self._hard01(llr)), src, w_out
                )
                flip = jnp.broadcast_to(
                    (cand == 1)[:, None, :], (w_out,) + llr.shape[1:]
                )
                return hard_p ^ self._pack_mask(flip), src, new_metrics
            hard_g = _take_state(hard, src)
            bits = hard_g * self._flip((cand == 1)[:, None, :], hard_g)
            return bits, src, new_metrics
        (m0, m1), (i0, i1) = self._weakest(mag, 2)
        zero = jnp.zeros_like(m0)
        deltas = jnp.stack([zero, -m0, -m1, -m0 - m1], axis=0)
        new_metrics, src, cand = self._prune(metrics, deltas)
        i0g = _take_vec(i0, src)
        i1g = _take_vec(i1, src)
        if self.bitplane:
            w_out = new_metrics.shape[0]
            hard_p = self._take_packed(
                self._pack01(self._hard01(llr)), src, w_out
            )
            pos = _iota((w_out,) + llr.shape[1:], 1)
        else:
            hard_g = _take_state(hard, src)
            pos = _iota(hard_g.shape, 1)
        flip0 = ((cand == 1) | (cand == 3))[:, None, :] & (
            pos == i0g[:, None, :]
        )
        flip1 = ((cand == 2) | (cand == 3))[:, None, :] & (
            pos == i1g[:, None, :]
        )
        if self.bitplane:
            return hard_p ^ self._pack_mask(flip0 | flip1), src, new_metrics
        bits = hard_g * self._flip(flip0 | flip1, hard_g)
        return bits, src, new_metrics

    def leaf_rep(self, llr, metrics):
        d_zero = self._min0sum(llr)
        d_one = -self._max0sum(llr)
        deltas = jnp.stack([d_zero, d_one], axis=0)
        new_metrics, src, cand = self._prune(metrics, deltas)
        if self.bitplane:
            # pack the [w, 1, B] decision first, broadcast the i32 word:
            # Mosaic rejects BOOL sublane-dim broadcasts at wide spans
            # (the f32/i32 equivalent lowers fine)
            word = self._pack_mask((cand != 0)[:, None, :])  # [1, B]
            return (
                jnp.broadcast_to(word, llr.shape[1:]), src, new_metrics
            )
        bits = jnp.broadcast_to(
            self._flip((cand != 0)[:, None, :], llr),
            cand.shape[:1] + llr.shape[1:],
        )
        return bits, src, new_metrics

    def leaf_spc(self, llr, metrics):
        hard = self._hard(llr)
        mag = jnp.abs(llr)
        ms, idxs = self._weakest(mag, 4)
        # parity from the hard decisions (matches _leaf_spc's prod(hard))
        neg = jnp.sum(jnp.where(hard < 0, 1, 0), axis=1)  # [L, B]
        parity_odd = neg % 2 == 1
        m0 = ms[0]
        t_np = np.asarray(_SPC_T)
        m0_even = np.asarray(_SPC_M0_EVEN)
        deltas = []
        for c in range(8):
            t_cost = sum(
                (ms[1 + j] for j in range(3) if t_np[c, j]),
                start=jnp.zeros_like(m0),
            )
            d_even = -float(m0_even[c]) * m0 - t_cost
            d_odd = -m0 - t_cost
            deltas.append(jnp.where(parity_odd, d_odd, d_even))
        deltas = jnp.stack(deltas, axis=0)  # [8, L, B]
        new_metrics, src, cand = self._prune(metrics, deltas)
        if self.bitplane:
            w_out = new_metrics.shape[0]
            hard_p = self._take_packed(
                self._pack01(self._hard01(llr)), src, w_out
            )
            pos = _iota((w_out,) + llr.shape[1:], 1)
        else:
            hard_g = _take_state(hard, src)
            pos = _iota(hard_g.shape, 1)
        parity_g = _take_vec(jnp.where(parity_odd, 1, 0), src)  # [L, B] int
        po = parity_g == 1
        even_t = np.asarray(_SPC_FLIPS_EVEN)
        odd_t = np.asarray(_SPC_FLIPS_ODD)
        flip_mask = pos < 0  # born-false bool [L, S, B]
        cand_masks = [cand == c for c in range(8)]  # [L, B] bools
        for j in range(4):
            ij = _take_vec(idxs[j], src)
            f_even = cand < 0  # born-false bool (Mosaic-safe)
            f_odd = cand < 0
            for c in range(8):
                if even_t[c, j]:
                    f_even = f_even | cand_masks[c]
                if odd_t[c, j]:
                    f_odd = f_odd | cand_masks[c]
            fj = (po & f_odd) | (~po & f_even)  # [L, B]
            flip_mask = flip_mask | (
                fj[:, None, :] & (pos == ij[:, None, :])
            )
        if self.bitplane:
            return hard_p ^ self._pack_mask(flip_mask), src, new_metrics
        bits = hard_g * self._flip(flip_mask, hard_g)
        return bits, src, new_metrics

    def leaf_enum(self, node, llr, metrics):
        """Scores for all 2^k codewords of the leaf subcode: the table is a
        +-1 constant matrix, so each score is a signed sum of span slices —
        pure VPU adds, no matmul, no table ref."""
        table = self.dec._enum_table(node)  # [C, S] numpy +-1 float32
        n_cand, span = table.shape
        sum_abs = jnp.sum(jnp.abs(llr).astype(jnp.float32), axis=1)  # [L, B]
        slices = [llr[:, s, :].astype(jnp.float32) for s in range(span)]
        deltas = []
        for c in range(n_cand):
            score = sum(
                (slices[s] if table[c, s] > 0 else -slices[s]
                 for s in range(span)),
                start=jnp.zeros_like(sum_abs),
            )
            deltas.append(0.5 * (score - sum_abs))
        deltas = jnp.stack(deltas, axis=0)  # [C, L, B]
        new_metrics, src, cand = self._prune(metrics, deltas)
        # decision bits from static +-1 patterns: Pallas kernels cannot
        # capture array constants, so the pattern is rebuilt from iota
        # comparisons against the (static) negative positions
        if self.bitplane:
            ones = jnp.zeros(cand.shape[:1] + llr.shape[1:], jnp.int32)
            pos = _iota(ones.shape, 1)
            for c in range(n_cand):
                neg_positions = [s for s in range(span) if table[c, s] < 0]
                if not neg_positions:
                    continue
                negmask = pos == neg_positions[0]
                for s in neg_positions[1:]:
                    negmask = negmask | (pos == s)
                ones = jnp.where(
                    (cand == c)[:, None, :] & negmask, 1, ones
                )
            return self._pack01(ones), src, new_metrics
        bits = jnp.ones(cand.shape[:1] + llr.shape[1:], llr.dtype)
        pos = _iota(bits.shape, 1)
        for c in range(n_cand):
            neg_positions = [s for s in range(span) if table[c, s] < 0]
            if not neg_positions:
                continue
            negmask = pos == neg_positions[0]
            for s in neg_positions[1:]:
                negmask = negmask | (pos == s)
            bits = jnp.where((cand == c)[:, None, :] & negmask, -1.0, bits)
        return bits, src, new_metrics

    # -- recursion -----------------------------------------------------------

    def _leaf(self, node: CodeNode, llr, metrics):
        if node.kind == NodeKind.RATE0:
            return self.leaf_rate0(llr, metrics)
        if node.kind == NodeKind.RATE1:
            return self.leaf_rate1(llr, metrics)
        if node.kind == NodeKind.ENUM:
            return self.leaf_enum(node, llr, metrics)
        if node.kind == NodeKind.REP:
            return self.leaf_rep(llr, metrics)
        return self.leaf_spc(llr, metrics)

    def node(self, node: CodeNode, llr, metrics):
        if node.kind != NodeKind.BRANCH:
            # leaves compute in float32 regardless of the state dtype:
            # Mosaic rejects several bf16 leaf patterns on real HW
            # (sublane broadcast_in_dim in leaf_rep, `llr < 0` mask
            # relayouts in char mode — interpret mode accepts both), and
            # it is value-identical anyway: leaf math is
            # sign/abs/compare/±1 products on the (already rounded)
            # inputs and metric sums were f32 all along. The bipolar f32
            # decision bits convert ONCE at leaf exit to the {0,1} int8
            # bit state (for bf16 state this upcast lets XLA's excess-
            # precision pass keep the upstream f/g chain unrounded on
            # TPU, so compiled-vs-interpret bit parity can differ for
            # near-tied paths; f32 state has no such caveat).
            bits, src, m = self._leaf(
                node,
                llr if self.sdt == jnp.float32 else llr.astype(jnp.float32),
                metrics,
            )
            if self.bitplane:
                return bits, src, m  # packed i32 word, no state dtype
            return bits.astype(self.sdt), src, m
        half = node.length // 2
        a, b = llr[:, :half, :], llr[:, half:, :]
        left_bits, p_left, metrics = self.node(  # BRANCH recursion
            node.left, self.f_fn(a, b), metrics
        )
        w_mid = metrics.shape[0]
        if p_left is not None:
            llr_g = _take_state(llr, p_left)
            a, b = llr_g[:, :half, :], llr_g[:, half:, :]
        g_bits = (
            self._packed_bipolar(left_bits, w_mid, a.dtype)
            if self.bitplane else left_bits
        )
        right_bits, p_right, metrics = self.node(
            node.right, self.g_fn(a, b, g_bits), metrics
        )
        perm = _compose0(p_left, p_right)
        if self.bitplane:
            if p_right is not None:
                left_bits = self._take_packed(
                    left_bits, p_right, metrics.shape[0]
                )
            return (
                jnp.concatenate(
                    [left_bits ^ right_bits, right_bits], axis=0
                ),
                perm,
                metrics,
            )
        if p_right is not None:
            left_bits = _take_state(left_bits, p_right)
        bits = jnp.concatenate([left_bits * right_bits, right_bits], axis=1)
        return bits, perm, metrics


def _static_width(decoder, node: CodeNode, w: int) -> int:
    """Trace-time list-width evolution through a subtree: each leaf fork
    multiplies the width by its candidate count, clamped at L (the exact
    widening rule of _BlEmitter._prune / models/scl.py _prune)."""
    n_list = decoder.list_size
    kind = node.kind
    if kind == NodeKind.RATE0:
        return w
    if kind == NodeKind.BRANCH:
        w = _static_width(decoder, node.left, w)
        return _static_width(decoder, node.right, w)
    if kind == NodeKind.RATE1:
        n_cand = 2 if node.length == 1 else 4
    elif kind == NodeKind.REP:
        n_cand = 2
    elif kind == NodeKind.SPC:
        n_cand = 8
    else:  # ENUM
        n_cand = decoder._enum_table(node).shape[0]
    return min(w * n_cand, n_list)


def build_bl_hybrid_decode_paths(decoder, batch_tile: int = 128,
                                 kernel_span: int = 256,
                                 interpret: bool = False,
                                 state_dtype=jnp.float32,
                                 bitplane=None,
                                 merge_prune=None):
    """Pallas [w, S, B] subtree kernels + XLA glue above.

    Progressive list widening runs end-to-end: the decode starts at width 1
    (no [L, N, B] root broadcast exists), glue levels and the frozen-heavy
    leftmost kernels carry only the live w < L paths, and widths grow at
    forks via static ("rep", c) tiles until they reach L (models/scl.py
    batch_first semantics; identical candidate sets, slot order, and
    tie-breaking).

    Returns fn: llr [B, N] f32 -> (codewords [B, L, N] u8, metrics [B, L]).
    B must be a multiple of batch_tile."""
    n_list = decoder.list_size
    n_len = decoder.block_length
    state_dtype = jnp.dtype(state_dtype)
    if bitplane is None:
        # measured v5e crossover (N=1024, span 512, B=1024): L=2 -6%,
        # L=4 wash, L=8 +3.5%, L=16 +26% — the packed word amortizes
        # with list size (fork = w var-shifts vs w(w-1) selects, combine
        # = 1 XOR vs w products) while the fixed pack/unpack overhead at
        # g calls and kernel boundaries does not shrink with w.
        # Capped at 32: the path axis packs into ONE i32 word.
        bitplane = 8 <= decoder.list_size <= 32
    elif bitplane and decoder.list_size > 32:
        raise ValueError(
            f"bitplane bit state packs the path axis into one i32 word; "
            f"list_size={decoder.list_size} > 32 is not representable "
            f"(use bitplane=False)"
        )
    if merge_prune is None:
        # measured v5e (N=1024 CRC16 B=1024, bitplane on, paired inputs,
        # bitwise-identical outputs): the sorted-heads merge wins from
        # L=8 up — L=8 0.434->0.397 ms (+9%), L=16 1.387->1.245 (+11%),
        # L=32 5.81->5.53 (+5%). At L<=4 extraction barely runs
        # (progressive widening covers most forks), so the sort-network
        # overhead would be a small net loss there.
        merge_prune = decoder.list_size >= 8
    emitter = _BlEmitter(decoder, state_dtype, bitplane=bitplane,
                         merge_prune=merge_prune)
    # widening kernels (w_in < w_out) SIGABRT the Mosaic compiler under a
    # bf16 state on real HW (profiling/kernel_profile.py ksplit: only the
    # leftmost w=1->L kernel fails; every construct probe passes alone).
    # Those kernels sit on the frozen-heavy prefix and cost ~5% of kernel
    # time, so they simply run in f32; steady-width kernels keep the
    # two-per-word bf16 state.
    emitter_f32 = (emitter if state_dtype == jnp.float32
                   else _BlEmitter(decoder, jnp.float32,
                                   bitplane=bitplane,
                                   merge_prune=merge_prune))
    # bitplane mode: decision bits flow through the ENTIRE hybrid — kernel
    # outputs, glue combines/gathers, and the decode tail — as ONE packed
    # [span, B] i32 word (plane l = path l). Kernel bits outputs shrink
    # L-fold, glue combines are one XOR (vs w products), glue forks are w
    # shift-ors (vs the w(w-1) select chain), and the CRC tail runs
    # syndrome XOR-reductions + a single shift-select on the word.
    packed_glue = emitter.bitplane
    subtree_cache = {}
    subtree_info = []  # (node, w_in, w_out, call) — profiling introspection

    def subtree_call(node: CodeNode, w_in: int):
        fn = subtree_cache.get((id(node), w_in))
        if fn is not None:
            return fn
        span = node.length
        w_out = _static_width(decoder, node, w_in)
        kdt = state_dtype if w_in == w_out else jnp.float32
        emit = emitter if kdt == state_dtype else emitter_f32
        # bits dtype a kernel of this span emits. Bitplane mode emits the
        # PACKED [span, B] i32 word itself — the glue then combines (one
        # XOR), gathers (w shift-ors vs the w(w-1) select chain) and the
        # decode tail (syndrome XOR-reductions, shift-select) all run on
        # the word, and the kernel's bits output shrinks Lx (no unpack).
        # Non-bitplane kernels keep {0,1} int8 at span >= 32 / bipolar
        # state-dtype below (_BlEmitter._BITS_I8_SPAN).
        bdt = jnp.int8 if span >= _BlEmitter._BITS_I8_SPAN else kdt

        def kernel(llr_ref, metrics_ref, bits_ref, perm_ref, out_met_ref):
            metrics = metrics_ref[...].T  # [w_in, B]
            bits, perm, metrics = emit.node(node, llr_ref[...], metrics)
            if perm is None:
                perm = _iota((w_out, batch_tile), 0)
            elif isinstance(perm, tuple):
                # pure widening inside this subtree: slot j sourced j // c
                perm = _iota((w_out, batch_tile), 0) // perm[1]
            if emit.bitplane:
                bits_ref[...] = bits  # the packed [span, B] i32 word
            elif bdt == jnp.int8:
                # ONE bipolar->{0,1}-int8 pass at the kernel boundary:
                # the glue gathers/combines and the CRC selection then
                # run at 1/4 the f32 HBM/vreg traffic. In-kernel int8
                # bit state SIGABRTs the Mosaic compiler (as does full
                # bf16); the boundary convert is the Mosaic-clean probe
                # pattern (profiling/bf16_probe.py i8_g).
                bits_ref[...] = _BlEmitter._to01(bits)
            else:
                bits_ref[...] = bits
            perm_ref[...] = perm.T
            out_met_ref[...] = metrics.T

        def call(llr, metrics):
            """llr [w_in, span, B] state-dtype, metrics [B, w_in] ->
            (bits: packed [span, B] i32 word in bitplane mode, else
            [w_out, span, B] {0,1} int8; perm [B, w_out];
            metrics [B, w_out])."""
            n_batch = llr.shape[-1]
            grid = (n_batch // batch_tile,)
            if packed_glue:
                bits_spec = pl.BlockSpec((span, batch_tile),
                                         lambda i: (0, i),
                                         memory_space=pltpu.VMEM)
                bits_shape = jax.ShapeDtypeStruct((span, n_batch),
                                                  jnp.int32)
            else:
                bits_spec = pl.BlockSpec((w_out, span, batch_tile),
                                         lambda i: (0, 0, i),
                                         memory_space=pltpu.VMEM)
                bits_shape = jax.ShapeDtypeStruct((w_out, span, n_batch),
                                                  bdt)
            bits, perm, met = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((w_in, span, batch_tile),
                                 lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch_tile, w_in), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    bits_spec,
                    pl.BlockSpec((batch_tile, w_out), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch_tile, w_out), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    bits_shape,
                    jax.ShapeDtypeStruct((n_batch, w_out), jnp.int32),
                    jax.ShapeDtypeStruct((n_batch, w_out), jnp.float32),
                ],
                interpret=interpret,
            )(llr.astype(kdt), metrics)
            if not packed_glue and bdt != jnp.int8 and bdt != state_dtype:
                bits = bits.astype(state_dtype)  # narrow widening kernel
            return bits, perm, met

        subtree_cache[(id(node), w_in)] = call
        subtree_info.append((node, w_in, w_out, call))
        return call

    def glue_take(x, perm):
        """decoder._bl_take with ("rep", c) widening-perm support."""
        if perm is None:
            return x
        if isinstance(perm, tuple):
            return _rep0(x, perm[1])
        return decoder._bl_take(x, perm)

    def glue_compose(p_early, p_late):
        """_compose0 for glue perms held in the [B, w] layout."""
        if p_early is None:
            return p_late
        if p_late is None:
            return p_early
        if isinstance(p_early, tuple):
            if isinstance(p_late, tuple):
                return ("rep", p_early[1] * p_late[1])
            return p_late // p_early[1]
        from ..models.scl import _take_last

        if isinstance(p_late, tuple):
            return jnp.repeat(p_early, p_late[1], axis=-1)
        return _take_last(p_early, p_late)

    def widen_full(llr, metrics):
        """Pad [w, S, B] state with inactive slots up to full L. Only for
        the rare leaf-above-kernel_span at w < L: the _bl_leaf_* machinery
        is full-width. Inactive candidates (metric ~ -1e30) lose every
        extraction to live ones, so live slots and final results match the
        widened reference path exactly."""
        w = llr.shape[0]
        if w == n_list:
            return llr, metrics
        pad = n_list - w
        llr = jnp.concatenate(
            [llr, jnp.zeros((pad,) + llr.shape[1:], llr.dtype)], axis=0
        )
        metrics = jnp.concatenate(
            [metrics, jnp.full(metrics.shape[:1] + (pad,), _NEG,
                               metrics.dtype)], axis=-1,
        )
        return llr, metrics

    def glue_take_packed(word, perm, w_out):
        """Path-fork gather on the packed [S, B] word in the XLA glue:
        w_out shift-ors instead of the (w-1)-pass [w, S, B] select chain
        — the glue analogue of the kernel's bitplane fork."""
        if perm is None:
            return word
        if isinstance(perm, tuple):
            return _BlEmitter._take_packed(word, perm, w_out)
        return _BlEmitter._take_packed(word, perm.T, w_out)

    def xla_node(node: CodeNode, llr, metrics):
        """llr [w, span, B], metrics [B, w] — the decoder's batch_last
        machinery for the wide levels; kernels below kernel_span. In
        packed_glue mode decision bits are the [span, B] i32 word."""
        if node.length <= kernel_span:
            return subtree_call(node, llr.shape[0])(llr, metrics)
        if node.kind != NodeKind.BRANCH:
            # rare leaf above kernel_span: the decoder's full-width _bl_leaf
            # machinery is float32 bipolar — cast around it
            llr, metrics = widen_full(llr, metrics)
            llr = llr.astype(jnp.float32)
            if node.kind == NodeKind.ENUM:
                bits, perm, metrics = decoder._bl_leaf_enum(
                    node, llr, metrics
                )
            else:
                bits, perm, metrics = getattr(
                    decoder, f"_bl_leaf_{node.kind.name.lower()}"
                )(llr, metrics)
            if packed_glue:
                bits = _BlEmitter._pack01(
                    _BlEmitter._to01(bits).astype(jnp.int32)
                )
            # int8 only at spans >= 32 (matches the kernel/glue invariant;
            # a sub-32-span leaf above kernel_span keeps bipolar state so
            # its BRANCH siblings combine in one dtype)
            elif node.length >= _BlEmitter._BITS_I8_SPAN:
                bits = _BlEmitter._to01(bits)
            else:
                bits = bits.astype(state_dtype)
            return bits, perm, metrics
        half = node.length // 2
        a, b = llr[:, :half], llr[:, half:]
        left_bits, p_left, metrics = xla_node(
            node.left, emitter.f_fn(a, b), metrics
        )
        w_mid = metrics.shape[-1]
        if p_left is not None:
            llr_g = glue_take(llr, p_left)
            a, b = llr_g[:, :half], llr_g[:, half:]
        g_bits = (
            emitter._packed_bipolar(left_bits, w_mid, a.dtype)
            if packed_glue else left_bits
        )
        right_bits, p_right, metrics = xla_node(
            node.right, emitter.g_fn(a, b, g_bits), metrics
        )
        perm = glue_compose(p_left, p_right)
        if packed_glue:
            if p_right is not None:
                left_bits = glue_take_packed(
                    left_bits, p_right, metrics.shape[-1]
                )
            return (
                jnp.concatenate(
                    [left_bits ^ right_bits, right_bits], axis=0
                ),
                perm,
                metrics,
            )
        if p_right is not None:
            left_bits = glue_take(left_bits, p_right)
        if left_bits.dtype == jnp.int8:
            bits = jnp.concatenate(
                [left_bits ^ right_bits, right_bits], axis=1
            )
        else:  # sub-32-span glue (tiny test configs only)
            bits = jnp.concatenate(
                [left_bits * right_bits, right_bits], axis=1
            )
            if node.length >= _BlEmitter._BITS_I8_SPAN:
                bits = _BlEmitter._to01(bits)
        return bits, perm, metrics

    def run_raw_packed(llr):
        """llr [B, N] -> (packed codeword word [N, B] i32 — plane l =
        path l's bit — and metrics [B, L]). Bitplane mode only; the
        decode tail (syndrome XOR-reductions + shift-select) consumes
        the word directly, so the [L, N, B] planes never materialize."""
        if not packed_glue:
            raise ValueError("raw_packed requires bitplane mode")
        llr = llr.astype(state_dtype)
        n_batch = llr.shape[0]
        if n_batch % batch_tile:
            raise ValueError(
                f"batch {n_batch} not a multiple of tile {batch_tile}"
            )
        llr_l = llr.T[None, :, :]  # width 1: no [L, N, B] broadcast
        metrics = jnp.zeros((n_batch, 1), dtype=jnp.float32)
        word, _, metrics = xla_node(decoder.tree, llr_l, metrics)
        width = metrics.shape[-1]
        if width < n_list:
            # degenerate tiny codes that never produce L candidates:
            # missing planes are already 0 in the word
            metrics = jnp.concatenate(
                [metrics,
                 jnp.full((n_batch, n_list - width), _NEG, jnp.float32)],
                axis=-1,
            )
        return word, metrics

    def run_raw_bits(llr):
        """llr [B, N] -> (codeword bits [L, N, B] {0,1} int8 — the
        kernel-native layout with NO relayout — and metrics [B, L])."""
        if packed_glue:
            word, metrics = run_raw_packed(llr)
            bits = jnp.stack(
                [((word >> l) & 1).astype(jnp.int8)
                 for l in range(n_list)], axis=0,
            )
            return bits, metrics
        llr = llr.astype(state_dtype)
        n_batch = llr.shape[0]
        if n_batch % batch_tile:
            raise ValueError(
                f"batch {n_batch} not a multiple of tile {batch_tile}"
            )
        llr_l = llr.T[None, :, :]  # width 1: no [L, N, B] broadcast
        metrics = jnp.zeros((n_batch, 1), dtype=jnp.float32)
        bits, _, metrics = xla_node(decoder.tree, llr_l, metrics)
        if bits.dtype != jnp.int8:  # N < 32 (tiny test codes)
            bits = _BlEmitter._to01(bits)
        width = metrics.shape[-1]
        if width < n_list:
            # degenerate tiny codes that never produce L candidates
            pad = n_list - width
            bits = jnp.concatenate(
                [bits, jnp.zeros((pad,) + bits.shape[1:], bits.dtype)],
                axis=0,
            )
            metrics = jnp.concatenate(
                [metrics, jnp.full((n_batch, pad), _NEG, jnp.float32)],
                axis=-1,
            )
        return bits, metrics

    def run_raw(llr):
        """llr [B, N] -> (codewords [L, N, B] u8 — the kernel-native
        layout, NO relayout — and metrics [B, L]). Callers that can consume
        the [L, N, B] layout (CRC-aided selection) avoid the ~0.1 ms
        [B, L, N] transpose of all L paths."""
        bits, metrics = run_raw_bits(llr)
        codewords = bits.astype(jnp.uint8)  # [w, N, B] {0,1}
        return codewords, metrics

    def run(llr):
        codewords, metrics = run_raw(llr)
        return codewords.transpose(2, 0, 1), metrics

    run.raw = run_raw
    run.raw_bits = run_raw_bits
    run.raw_packed = run_raw_packed if packed_glue else None
    run.subtree_info = subtree_info
    return run
