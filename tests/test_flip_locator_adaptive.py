"""SCFlip (DepthFirst), ErrorLocator, and Adaptive decoder tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polar_codes_tpu.construction import frozen_bits, frozen_bit_mask
from polar_codes_tpu.models.encoder import PolarEncoder
from polar_codes_tpu.models.fastssc import FastSSCDecoder
from polar_codes_tpu.models.depthfirst import DepthFirstDecoder
from polar_codes_tpu.models.errorlocator import ErrorLocator
from polar_codes_tpu.models.adaptive import AdaptiveDecoder
from polar_codes_tpu.models.detectors import CRC8
from polar_codes_tpu.dsp import bpsk_modulate, add_awgn


class TestDepthFirst:
    def test_noiseless_roundtrip(self, rng):
        n_len, k_len = 64, 40
        frozen = frozen_bits(n_len, k_len, 0.0)
        enc = PolarEncoder(n_len, frozen, systematic=True)
        dec = DepthFirstDecoder(n_len, frozen, systematic=True, trial_limit=4)
        info = rng.integers(0, 2, (8, k_len)).astype(np.uint8)
        code = enc.encode(jnp.asarray(info))
        decoded, codeword, _ = dec.decode(bpsk_modulate(code) * 8.0)
        np.testing.assert_array_equal(np.asarray(decoded), info)

    def test_flip_gain_over_sc(self, rng):
        """At a waterfall operating point SCFlip-16 must beat plain SC:
        single-bit-error frames are recoverable by one flip."""
        n_len, k_len = 128, 72
        frozen = frozen_bits(n_len, k_len, 0.0)
        det = CRC8()
        enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
        sc = FastSSCDecoder(n_len, frozen, systematic=True, detector=det)
        flip = DepthFirstDecoder(
            n_len, frozen, systematic=True, detector=det, trial_limit=16
        )
        batch = 192
        info = rng.integers(0, 2, (batch, k_len)).astype(np.uint8)
        tx = bpsk_modulate(enc.encode(jnp.asarray(info)))
        esn0 = 10 ** 0.25 * k_len / n_len
        rx = add_awgn(jax.random.PRNGKey(5), tx, esn0_linear=esn0)
        d_sc, _, _ = sc.decode(rx)
        d_fl, _, _ = flip.decode(rx)
        payload = info[:, :-8]
        e_sc = np.mean(np.any(np.asarray(d_sc)[:, :-8] != payload, axis=1))
        e_fl = np.mean(np.any(np.asarray(d_fl)[:, :-8] != payload, axis=1))
        assert e_sc > 0.03
        assert e_fl < e_sc

    def test_unflagged_when_crc_cannot_pass(self, rng):
        n_len, k_len = 64, 40
        frozen = frozen_bits(n_len, k_len, 0.0)
        det = CRC8()
        enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
        dec = DepthFirstDecoder(
            n_len, frozen, systematic=True, detector=det, trial_limit=4
        )
        info = rng.integers(0, 2, (4, k_len)).astype(np.uint8)
        llr = np.array(bpsk_modulate(enc.encode(jnp.asarray(info))) * 8.0)
        llr[0] = -llr[0]
        _, _, ok = dec.decode(jnp.asarray(llr))
        ok = np.asarray(ok)
        assert not ok[0] and ok[1:].all()


class TestErrorLocator:
    def test_clean_frames_have_no_errors(self, rng):
        n_len, k_len = 128, 64
        frozen = frozen_bits(n_len, k_len, 0.0)
        enc = PolarEncoder(n_len, frozen, systematic=False)
        loc = ErrorLocator(n_len, frozen)
        info = rng.integers(0, 2, (8, k_len)).astype(np.uint8)
        code = enc.encode(jnp.asarray(info))
        llr = bpsk_modulate(code) * 8.0
        first, err = loc.locate(llr, code)
        assert (np.asarray(first) == n_len).all()
        assert not np.asarray(err).any()

    def test_errors_only_on_info_channels(self, rng):
        n_len, k_len = 128, 64
        frozen = frozen_bits(n_len, k_len, 0.0)
        mask = frozen_bit_mask(n_len, frozen)
        enc = PolarEncoder(n_len, frozen, systematic=False)
        loc = ErrorLocator(n_len, frozen)
        info = rng.integers(0, 2, (64, k_len)).astype(np.uint8)
        code = enc.encode(jnp.asarray(info))
        rx = add_awgn(
            jax.random.PRNGKey(9), bpsk_modulate(code), esn0_linear=0.7
        )
        first, err = loc.locate(rx, code)
        err = np.asarray(err)
        assert err.any()  # heavy noise must produce genie errors
        assert not err[:, mask].any()  # frozen channels never err

    def test_histogram_concentrates_on_weak_channels(self, rng):
        """Construction orders channels by model reliability; empirical
        genie errors must hit the *least* reliable info channels far more
        often than the most reliable ones."""
        from polar_codes_tpu.construction import beta_expansion_weights

        n_len, k_len = 256, 128
        frozen = frozen_bits(n_len, k_len, 0.0)
        enc = PolarEncoder(n_len, frozen, systematic=False)
        loc = ErrorLocator(n_len, frozen)
        info = rng.integers(0, 2, (512, k_len)).astype(np.uint8)
        code = enc.encode(jnp.asarray(info))
        rx = add_awgn(
            jax.random.PRNGKey(10), bpsk_modulate(code), esn0_linear=0.9
        )
        _, err = loc.locate(rx, code)
        err_counts = np.asarray(err).sum(axis=0)
        w = beta_expansion_weights(n_len)  # higher = more reliable
        info_pos = np.setdiff1d(np.arange(n_len), frozen)
        order = info_pos[np.argsort(-w[info_pos])]  # most reliable first
        strong = err_counts[order[: k_len // 4]].sum()
        weak = err_counts[order[-k_len // 4 :]].sum()
        assert weak > 3 * strong


class TestAdaptive:
    def test_matches_scl_on_hard_blocks(self, rng):
        """Adaptive output must equal: fast result where its CRC passes,
        list result elsewhere."""
        n_len, k_len = 128, 64
        frozen = frozen_bits(n_len, k_len, 0.0)
        det = CRC8()
        from polar_codes_tpu.models.scl import SCLDecoder

        enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
        fast = FastSSCDecoder(n_len, frozen, systematic=True, detector=det)
        scl = SCLDecoder(n_len, frozen, list_size=8, systematic=True,
                         detector=det)
        ada = AdaptiveDecoder(n_len, frozen, list_size=8, systematic=True,
                              detector=det, fast_dtype=jnp.float32)
        info = rng.integers(0, 2, (128, k_len)).astype(np.uint8)
        tx = bpsk_modulate(enc.encode(jnp.asarray(info)))
        rx = add_awgn(jax.random.PRNGKey(6), tx,
                      esn0_linear=10 ** 0.2 * k_len / n_len)
        f_info, _, f_ok = fast.decode(rx)
        s_info, _, _ = scl.decode(rx)
        a_info, _, a_ok = ada.decode(rx)
        f_ok = np.asarray(f_ok)
        np.testing.assert_array_equal(
            np.asarray(a_info)[f_ok], np.asarray(f_info)[f_ok]
        )
        np.testing.assert_array_equal(
            np.asarray(a_info)[~f_ok], np.asarray(s_info)[~f_ok]
        )
