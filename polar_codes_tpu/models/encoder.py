"""Polar encoder: batched systematic / non-systematic butterfly encoding.

Capability parity with the reference's production encoder ButterflyFipPacked
(/root/reference/src/polarcode/encoding/butterfly_fip_packed.cpp:45-69) and
the Encoder base (/root/reference/src/polarcode/encoding/encoder.{h,cpp}):
CRC generation into the info tail, info-bit injection at non-frozen
positions, n butterfly stages, and the Vangala systematic trick
(transform -> reset frozen bits -> transform again).

TPU-first: operates on [..., K] / [..., N] {0,1} arrays where leading axes
are batch; the butterfly stages are fused reshape+XOR passes over the whole
batch (see ops/butterfly.py) instead of per-codeword AVX register shifts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..construction import frozen_bit_mask, info_indices
from ..ops.butterfly import butterfly_transform, butterfly_transform_bipolar
from .detectors import Detector, Dummy
from ..utils.backend import resolve_backend


class PolarEncoder:
    """Batched polar encoder for one (N, frozen-set) code.

    All code structure (masks, index vectors) is host-side NumPy baked into
    the traced program as constants — the analogue of the reference's
    construction-time specialization.
    """

    def __init__(
        self,
        block_length: int,
        frozen_bit_positions: Sequence[int],
        systematic: bool = True,
        detector: Optional[Detector] = None,
        backend: Optional[str] = None,
    ):
        n = block_length.bit_length() - 1
        if (1 << n) != block_length:
            raise ValueError(f"block length {block_length} is not a power of 2")
        self.block_length = block_length
        self.stages = n
        self.frozen = np.sort(np.asarray(frozen_bit_positions, dtype=np.int64))
        self.frozen_mask = frozen_bit_mask(block_length, self.frozen)
        self.info_pos = info_indices(block_length, self.frozen)
        self.info_length = int(self.info_pos.size)
        self.systematic = systematic
        self.detector = detector if detector is not None else Dummy()
        # backend="pallas": one VMEM-resident kernel runs ALL butterfly
        # stages of both systematic passes (ops/butterfly_kernel.py) — the
        # XLA path round-trips [B, N] f32 through HBM every stage; above
        # N=2048 the MXU-factored GF(2) transform (bit-exact, to N=131072).
        # backend=None auto-selects the fast path on TPU (utils/backend.py)
        backend = resolve_backend(backend, "encode", block_length)
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend}")
        self.backend = backend
        self._pallas_fn = None
        self._PALLAS_TILE = 128

    # -- info <-> u-domain plumbing ----------------------------------------

    def inject(self, info_bits):
        """Scatter [..., K] info bits into a [..., N] u-vector (frozen = 0).

        Replaces PackedContainer::insertPackedInformationBits
        (bitcontainer.cpp:715-886); here it is one static-index scatter.
        """
        x = jnp.asarray(info_bits)
        if x.shape[-1] != self.info_length:
            raise ValueError(
                f"expected {self.info_length} info bits, got {x.shape[-1]}"
            )
        u = jnp.zeros(x.shape[:-1] + (self.block_length,), dtype=x.dtype)
        return u.at[..., jnp.asarray(self.info_pos)].set(x)

    def extract(self, block_bits):
        """Gather [..., N] -> [..., K] info bits at non-frozen positions."""
        return jnp.asarray(block_bits)[..., jnp.asarray(self.info_pos)]

    # -- encoding -----------------------------------------------------------

    def encode(self, info_bits, generate_crc: bool = True):
        """[..., K] info bits -> [..., N] codeword bits.

        With a non-dummy detector and generate_crc=True, the last
        detector.tail_bits of the info block are overwritten with the
        checksum first (ButterflyFipPacked::encode, :47).
        """
        x = jnp.asarray(info_bits)
        if x.shape[-1] != self.info_length:
            raise ValueError(
                f"expected {self.info_length} info bits, got {x.shape[-1]}"
            )
        if generate_crc and self.detector.tail_bits:
            x = self.detector.generate(x)
        # fast-path dispatch: the all-stage VMEM kernel is proven at
        # N<=2048; beyond that its Mosaic compile fails on HW (r3 grid:
        # remote-compile 500 at N=4096), so large blocks use the
        # MXU-factored transform (two GF(2) matmuls, ops/butterfly.py
        # polar_transform_mxu) — no Mosaic, no VMEM ceiling, exact
        if self.backend == "pallas":
            if self.block_length <= 2048:
                return self._encode_pallas(x)
            return self._encode_mxu(x)
        # bipolar float32 internally: XOR becomes multiply on the VPU's
        # native dtype — ~3x faster than uint8 stages on TPU, bit-identical
        frozen_m = jnp.asarray(self.frozen_mask)
        u = jnp.ones(x.shape[:-1] + (self.block_length,), jnp.float32)
        u = u.at[..., jnp.asarray(self.info_pos)].set(
            1.0 - 2.0 * x.astype(jnp.float32)
        )
        code = butterfly_transform_bipolar(u)
        if self.systematic:
            code = jnp.where(frozen_m, 1.0, code)  # re-freeze: bit 0 = +1
            code = butterfly_transform_bipolar(code)
        return jnp.signbit(code).astype(jnp.uint8)

    def _encode_pallas(self, x):
        """Fused all-stage VMEM encode; pads the batch to the lane tile."""
        if self._pallas_fn is None:
            from ..ops.butterfly_kernel import build_encode_kernel

            self._pallas_fn = build_encode_kernel(
                self.block_length, self.frozen_mask,
                systematic=self.systematic,
                batch_tile=self._PALLAS_TILE,
            )
        lead = x.shape[:-1]
        u = self.inject(x.astype(jnp.uint8))
        flat = u.reshape((-1, self.block_length))
        n_batch = flat.shape[0]
        pad = (-n_batch) % self._PALLAS_TILE
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, self.block_length), flat.dtype)]
            )
        code = self._pallas_fn(flat)
        if pad:
            code = code[:n_batch]
        return code.reshape(lead + (self.block_length,))

    def _encode_mxu(self, x):
        """Kronecker-factored MXU encode for large N (both passes)."""
        from ..ops.butterfly import polar_transform_mxu

        inv = jnp.asarray(1.0 - self.frozen_mask, jnp.float32)
        u = self.inject(x.astype(jnp.float32))
        code = polar_transform_mxu(u)
        if self.systematic:
            code = code * inv  # re-freeze: frozen rows back to 0
            code = polar_transform_mxu(code)
        return code.astype(jnp.uint8)

    def transform(self, bits):
        """Raw N-stage butterfly (involution); exposed for decoders that
        re-encode to recover u from a codeword estimate."""
        return butterfly_transform(bits)
