"""Pallas whole-tree SCL kernel: interpret-mode equivalence with the XLA
implementation (the TPU compile path is exercised on hardware by bench)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polar_codes_tpu.construction import frozen_bits
from polar_codes_tpu.models.scl import SCLDecoder
from polar_codes_tpu.models.detectors import CRC16


class TestBatchOnLanesKernel:
    """Second-generation [L, span, B] subtree kernels
    (ops/scl_kernel_bl.py): interpret-mode equivalence with the XLA path.
    The compiled TPU path is A/B'd on hardware (BLER statistically
    identical over 8192 blocks; see the module docstring)."""

    @pytest.mark.parametrize(
        "n_len,k_len,list_size,span",
        [(256, 128, 8, 64), (256, 160, 4, 256), (1024, 512, 8, 256)],
    )
    def test_interpret_matches_xla(self, n_len, k_len, list_size, span, rng):
        from polar_codes_tpu.ops.scl_kernel_bl import (
            build_bl_hybrid_decode_paths,
        )

        frozen = frozen_bits(n_len, k_len, 0.0)
        dec = SCLDecoder(n_len, frozen, list_size=list_size, detector=CRC16())
        fn = build_bl_hybrid_decode_paths(
            dec, batch_tile=16, kernel_span=span, interpret=True
        )
        llr = jnp.asarray(rng.normal(0, 2, (32, n_len)), jnp.float32)
        cw_ref, m_ref, _ = dec.decode_paths(llr)
        cw, m = fn(llr)
        np.testing.assert_allclose(
            np.asarray(m), np.asarray(m_ref), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(cw), np.asarray(cw_ref))

    def test_all_leaf_kinds(self, rng):
        from polar_codes_tpu.ops.scl_kernel_bl import (
            build_bl_hybrid_decode_paths,
        )

        n_len = 64
        frozen = sorted(
            set(
                list(range(16))
                + [16, 17, 18, 20, 24]
                + [32, 33, 34, 35, 36, 37, 38]
                + [48]
            )
        )
        dec = SCLDecoder(n_len, frozen, list_size=4, enum_span=8,
                         max_enum_k=3)
        fn = build_bl_hybrid_decode_paths(
            dec, batch_tile=8, kernel_span=32, interpret=True
        )
        llr = jnp.asarray(rng.normal(0, 2, (16, n_len)), jnp.float32)
        cw_ref, m_ref, _ = dec.decode_paths(llr)
        cw, m = fn(llr)
        np.testing.assert_allclose(
            np.asarray(m), np.asarray(m_ref), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(cw), np.asarray(cw_ref))

    def test_bf16_state_matches_xla_bf16(self, rng):
        """state_dtype=bfloat16 packs kernel state two-per-vreg-word.

        The kernel computes leaves in f32 (Mosaic rejects several bf16
        leaf patterns on real HW), and the f32 upcast lets XLA's
        excess-precision pass keep the upstream f/g chain unrounded —
        kernel numerics land BETWEEN pure-bf16 and pure-f32, so exact
        bit parity with the XLA bf16 path cannot be pinned. Assert
        statistical agreement instead: metrics within bf16 rounding
        noise and ~all codeword bits identical (near-tied paths may
        swap). BLER equality with f32 is A/B'd on hardware."""
        from polar_codes_tpu.ops.scl_kernel_bl import (
            build_bl_hybrid_decode_paths,
        )

        n_len, k_len = 256, 128
        frozen = frozen_bits(n_len, k_len, 0.0)
        dec = SCLDecoder(n_len, frozen, list_size=8, detector=CRC16(),
                         dtype=jnp.bfloat16)
        fn = build_bl_hybrid_decode_paths(
            dec, batch_tile=16, kernel_span=64, interpret=True,
            state_dtype=jnp.bfloat16,
        )
        llr = jnp.asarray(rng.normal(0, 2, (32, n_len)), jnp.float32)
        cw_ref, m_ref, _ = dec.decode_paths(llr.astype(jnp.bfloat16))
        cw, m = fn(llr)
        np.testing.assert_allclose(
            np.asarray(m), np.asarray(m_ref), rtol=0.02, atol=0.25
        )
        mismatch = np.mean(np.asarray(cw) != np.asarray(cw_ref))
        assert mismatch < 0.02, f"codeword bit mismatch {mismatch:.4f}"
        # the ML path (slot 0 after pruning) must agree tighter than the
        # tail slots: bf16 rounding perturbs near-tied low-rank paths but
        # the winner's metric is well separated
        np.testing.assert_allclose(
            np.asarray(m)[:, 0], np.asarray(m_ref)[:, 0], rtol=0.005,
            atol=0.06,
        )

    def test_int8_char_matches_xla_int8(self, rng):
        """int8 (SclFipChar) mode on the pallas backend: saturating f/g on
        bf16 state — every value is an integer in [-254, 254], exact in
        bf16, so the kernels must match the XLA int8 path bit-for-bit."""
        import polar_codes_tpu.ops.scl_kernel_bl as kbl

        n_len, k_len = 256, 128
        frozen = frozen_bits(n_len, k_len, 0.0)
        ref = SCLDecoder(n_len, frozen, list_size=8, detector=CRC16(),
                         dtype=jnp.int8)
        dec = SCLDecoder(n_len, frozen, list_size=8, detector=CRC16(),
                         dtype=jnp.int8, backend="pallas")
        dec._PALLAS_TILE = 16
        dec._pallas_fn = kbl.build_bl_hybrid_decode_paths(
            dec, batch_tile=16, kernel_span=64, interpret=True,
            state_dtype=jnp.bfloat16,
        )
        llr = jnp.asarray(
            rng.integers(-100, 101, (32, n_len)).astype(np.int8)
        )
        cw_r, m_r, _ = ref.decode_paths(llr)
        cw_p, m_p, _ = dec.decode_paths(llr)
        np.testing.assert_array_equal(np.asarray(cw_p), np.asarray(cw_r))
        np.testing.assert_allclose(
            np.asarray(m_p), np.asarray(m_r), atol=1e-3
        )
        i1, _, ok1 = dec.decode(llr)
        i2, _, ok2 = ref.decode(llr)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))

    def test_backend_pallas_pads_odd_batches(self, rng):
        # the decoder-level backend wires padding/reshape around the tile;
        # exercised in interpret mode by monkeypatching the builder flag
        import polar_codes_tpu.ops.scl_kernel_bl as kbl

        frozen = frozen_bits(128, 64, 0.0)
        dec = SCLDecoder(128, frozen, list_size=4, detector=CRC16(),
                         backend="pallas")
        dec._PALLAS_TILE = 8
        orig = kbl.build_bl_hybrid_decode_paths
        dec._pallas_fn = orig(dec, batch_tile=8, kernel_span=128,
                              interpret=True)
        ref = SCLDecoder(128, frozen, list_size=4, detector=CRC16())
        llr = jnp.asarray(rng.normal(0, 2, (13, 128)), jnp.float32)
        cw, m, act = dec.decode_paths(llr)
        cw_r, m_r, act_r = ref.decode_paths(llr)
        np.testing.assert_array_equal(np.asarray(cw), np.asarray(cw_r))
        np.testing.assert_allclose(
            np.asarray(m), np.asarray(m_r), rtol=1e-4, atol=1e-4
        )
        # the fused decode() path (layout-native CRC-aided selection)
        i, c, ok = dec.decode(llr)
        i_r, c_r, ok_r = ref.decode(llr)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_r))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c_r))
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_r))

    def test_decode_retrace_no_tracer_leak(self, rng):
        # the syndrome/info-selection constants are cached on first use,
        # which can be INSIDE a jit trace; a jnp array created there is a
        # tracer and caching it poisoned every later trace
        # (UnexpectedTracerError on any re-jit of decode)
        import polar_codes_tpu.ops.scl_kernel_bl as kbl

        frozen = frozen_bits(128, 64, 0.0)
        dec = SCLDecoder(128, frozen, list_size=4, detector=CRC16(),
                         backend="pallas")
        dec._PALLAS_TILE = 8
        dec._pallas_fn = kbl.build_bl_hybrid_decode_paths(
            dec, batch_tile=8, kernel_span=128, interpret=True
        )
        llr = jnp.asarray(rng.normal(0, 2, (8, 128)), jnp.float32)
        first = jax.jit(lambda x: dec.decode(x)[1])(llr)
        second = jax.jit(lambda x: dec.decode(x)[1])(llr)  # fresh trace
        np.testing.assert_array_equal(np.asarray(first), np.asarray(second))


class TestBitplaneState:
    """Path-axis i32 bitplane bit state (the L>=8 kernel default):
    helper-level equivalence with the select-chain formulation plus an
    explicit bitplane on/off A/B of the full hybrid decode (both builds
    stay covered regardless of the auto-gating default)."""

    def test_take_packed_matches_take_state(self, rng):
        from polar_codes_tpu.ops.scl_kernel_bl import _BlEmitter, _take_state

        w, span, batch = 8, 16, 8
        b01 = rng.integers(0, 2, (w, span, batch)).astype(np.int32)
        bipolar = jnp.asarray(1.0 - 2.0 * b01, jnp.float32)
        packed = _BlEmitter._pack01(jnp.asarray(b01))
        for src in (
            jnp.asarray(rng.integers(0, w, (w, batch)), jnp.int32),  # fork
            ("rep", 2),                                # static widening
        ):
            got = _BlEmitter._take_packed(packed, src, w)
            got_planes = _BlEmitter._packed_planes(got, w)
            want = _take_state(bipolar, src)[:w]
            np.testing.assert_array_equal(
                np.asarray(got_planes), (np.asarray(want) < 0).astype(np.int32)
            )

    def test_packed_bipolar_roundtrip(self, rng):
        from polar_codes_tpu.ops.scl_kernel_bl import _BlEmitter

        w, span, batch = 8, 4, 8
        b01 = rng.integers(0, 2, (w, span, batch)).astype(np.int32)
        packed = _BlEmitter._pack01(jnp.asarray(b01))
        em = _BlEmitter.__new__(_BlEmitter)
        u = em._packed_bipolar(packed, w, jnp.float32)
        np.testing.assert_array_equal(np.asarray(u), 1.0 - 2.0 * b01)

    def test_bitplane_rejects_list_over_32(self):
        """One i32 word holds 32 path planes; L>32 must refuse bitplane
        (and the auto-default must not pick it) rather than silently
        dropping decision bits in shifts past the word width."""
        from polar_codes_tpu.ops.scl_kernel_bl import (
            build_bl_hybrid_decode_paths,
        )

        frozen = frozen_bits(64, 32, 0.0)
        dec = SCLDecoder(64, frozen, list_size=64, detector=CRC16())
        with pytest.raises(ValueError, match="bitplane"):
            build_bl_hybrid_decode_paths(
                dec, batch_tile=8, kernel_span=32, interpret=True,
                bitplane=True,
            )
        # auto-default at L=64 must choose the select-chain path
        fn = build_bl_hybrid_decode_paths(
            dec, batch_tile=8, kernel_span=32, interpret=True,
        )
        assert fn is not None

    @pytest.mark.parametrize("list_size", [4, 8])
    def test_bitplane_onoff_identical(self, list_size, rng):
        from polar_codes_tpu.ops.scl_kernel_bl import (
            build_bl_hybrid_decode_paths,
        )

        n_len, k_len = 256, 128
        frozen = frozen_bits(n_len, k_len, 0.0)
        dec = SCLDecoder(n_len, frozen, list_size=list_size,
                         detector=CRC16())
        llr = jnp.asarray(rng.normal(0, 2, (16, n_len)), jnp.float32)
        outs = {}
        for bp in (False, True):
            fn = build_bl_hybrid_decode_paths(
                dec, batch_tile=8, kernel_span=64, interpret=True,
                bitplane=bp,
            )
            outs[bp] = fn(llr)
        np.testing.assert_array_equal(
            np.asarray(outs[False][0]), np.asarray(outs[True][0])
        )
        np.testing.assert_allclose(
            np.asarray(outs[False][1]), np.asarray(outs[True][1]),
            rtol=1e-6, atol=1e-6,
        )


class TestPruneEquivalence:
    """The three extraction implementations must produce the EXACT same
    (metrics, src, cand) — value, order, and ties — since the pallas
    decode's bit parity with the XLA path rests on it."""

    def test_bitonic_and_merge_match_iterative(self):
        from polar_codes_tpu.ops.scl_kernel_bl import _BlEmitter

        class _Dec:
            _int8 = False

        rng = np.random.default_rng(42)
        checked = 0
        for n_list in (2, 4, 8, 16, 32):
            for n_cand in (2, 3, 4, 8, 16):
                for width in sorted({1, 2, max(n_list // 2, 1), n_list}):
                    if width * n_cand <= n_list:
                        continue  # widening branch: no extraction runs
                    dec = _Dec()
                    dec.list_size = n_list
                    e_it = _BlEmitter(dec, merge_prune=False)
                    e_mg = _BlEmitter(dec, merge_prune=True)
                    n_b = 8
                    metrics = rng.normal(0, 5, (width, n_b)).astype(
                        np.float32)
                    deltas = -np.abs(rng.normal(0, 3, (n_cand, width, n_b))
                                     ).astype(np.float32)
                    # force exact ties across candidates, paths, and a
                    # zero-delta block (the tie rule is the contract)
                    deltas[0] = deltas[-1]
                    metrics[0] = metrics[-1]
                    deltas[:, :, :4] = 0.0
                    m1, s1, c1 = e_it._prune(jnp.asarray(metrics),
                                             jnp.asarray(deltas))
                    m2, s2, c2 = e_mg._prune(jnp.asarray(metrics),
                                             jnp.asarray(deltas))
                    np.testing.assert_array_equal(np.asarray(m1),
                                                  np.asarray(m2))
                    np.testing.assert_array_equal(np.asarray(s1),
                                                  np.asarray(s2))
                    np.testing.assert_array_equal(np.asarray(c1),
                                                  np.asarray(c2))
                    checked += 1
        assert checked > 40
