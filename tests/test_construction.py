"""Construction tests, mirroring the reference's constructiontest.cpp and
qa_pypolar test fixtures (NumPy reference implementations, not mocks)."""

import numpy as np
import pytest

from polar_codes_tpu.construction import (
    frozen_bits,
    frozen_bit_mask,
    info_indices,
    split_frozen_bits,
    bhattacharyya_frozen_bits,
    beta_expansion_frozen_bits,
    beta_expansion_weights,
    nr_frozen_bits,
    nr_reliability_sequence,
    gaussian_approximation_frozen_bits,
)
from polar_codes_tpu.construction.nr_sequence import NR_RELIABILITY_SEQUENCE_1024


def brute_force_bhattacharyya(n_len, k_len, design_snr):
    """Independent scalar recursion (reference bhattacharrya.cpp:66-81)."""
    snr_lin = 10.0 ** (design_snr / 10.0)
    z = np.zeros(n_len)
    z[0] = np.exp(-2.0 * snr_lin * k_len / n_len)
    stages = int(np.log2(n_len))
    for stage in range(stages - 1, -1, -1):
        b = 1 << stage
        for j in range(0, n_len, 2 * b):
            t = z[j]
            z[j + b] = t * t
            z[j] = 2 * t - t * t
    order = np.argsort(-z.astype(np.float32), kind="stable")
    return np.sort(order[: n_len - k_len])


class TestBhattacharyya:
    @pytest.mark.parametrize("n_len,k_len", [(8, 4), (64, 40), (256, 128), (1024, 512)])
    @pytest.mark.parametrize("snr", [-1.59, 0.0, 2.0])
    def test_matches_scalar_recursion(self, n_len, k_len, snr):
        got = bhattacharyya_frozen_bits(n_len, k_len, snr)
        want = brute_force_bhattacharyya(n_len, k_len, snr)
        np.testing.assert_array_equal(got, want)

    def test_count_and_sorted(self):
        f = bhattacharyya_frozen_bits(128, 72, 1.0)
        assert len(f) == 56
        assert np.all(np.diff(f) > 0)

    def test_channel_zero_always_frozen(self):
        # channel 0 is the worst channel for any rate < 1
        for n_len in (16, 64, 512):
            f = bhattacharyya_frozen_bits(n_len, n_len // 2, 0.0)
            assert 0 in f
            assert (n_len - 1) not in f

    def test_non_power_of_two_raises(self):
        with pytest.raises(ValueError):
            bhattacharyya_frozen_bits(100, 50, 0.0)


class TestBetaExpansion:
    def test_weights_formula(self):
        w = beta_expansion_weights(16)
        beta = 2.0 ** 0.25
        # w(i) = sum_j bit_j(i) beta^j
        assert w[0] == 0.0
        assert np.isclose(w[1], 1.0)
        assert np.isclose(w[2], beta)
        assert np.isclose(w[3], 1.0 + beta)
        assert np.isclose(w[8], beta ** 3)

    def test_frozen_are_lowest_weight(self):
        n_len, k_len = 64, 32
        f = beta_expansion_frozen_bits(n_len, k_len)
        w = beta_expansion_weights(n_len)
        thresh = np.sort(w)[n_len - k_len - 1]
        assert np.all(w[f] <= thresh + 1e-12)

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            beta_expansion_frozen_bits(32, 64)


class TestFiveG:
    def test_sequence_is_permutation(self):
        assert np.array_equal(
            np.sort(NR_RELIABILITY_SEQUENCE_1024), np.arange(1024)
        )

    def test_known_prefix(self):
        # TS 38.212 Table 5.3.1.2-1 first entries
        np.testing.assert_array_equal(
            NR_RELIABILITY_SEQUENCE_1024[:16],
            [0, 1, 2, 4, 8, 16, 32, 3, 5, 64, 9, 6, 17, 10, 18, 128],
        )

    def test_sub_block_restriction(self):
        seq = nr_reliability_sequence(64)
        assert np.array_equal(np.sort(seq), np.arange(64))
        # restriction preserves relative order
        full = NR_RELIABILITY_SEQUENCE_1024
        assert list(seq) == [x for x in full if x < 64]

    def test_frozen_bits(self):
        f = nr_frozen_bits(64, 40)
        assert len(f) == 24
        assert np.all(f < 64)
        assert 0 in f  # least reliable channel

    def test_oversize_raises(self):
        with pytest.raises(ValueError):
            nr_frozen_bits(2048, 1024)


class TestGaussianApproximation:
    @pytest.mark.parametrize("n_len,k_len", [(64, 32), (256, 128), (1024, 512)])
    def test_reasonable_overlap_with_bb(self, n_len, k_len):
        # GA and BB must agree on the vast majority of frozen channels
        ga = set(gaussian_approximation_frozen_bits(n_len, k_len, 1.0).tolist())
        bb = set(bhattacharyya_frozen_bits(n_len, k_len, 1.0).tolist())
        overlap = len(ga & bb) / len(bb)
        assert overlap > 0.9

    def test_channel_ordering_sane(self):
        f = gaussian_approximation_frozen_bits(64, 32, 0.0)
        assert 0 in f and 63 not in f and len(f) == 32


class TestFactory:
    def test_dispatch(self):
        np.testing.assert_array_equal(
            frozen_bits(64, 32, 1.0, "BB"), bhattacharyya_frozen_bits(64, 32, 1.0)
        )
        np.testing.assert_array_equal(
            frozen_bits(64, 32, 1.0, "BE"), beta_expansion_frozen_bits(64, 32, 1.0)
        )
        np.testing.assert_array_equal(
            frozen_bits(64, 32, 1.0, "5G"), nr_frozen_bits(64, 32, 1.0)
        )
        # default / unknown falls back to BB (constructor.cpp:50-60)
        np.testing.assert_array_equal(
            frozen_bits(64, 32, 1.0, "whatever"),
            bhattacharyya_frozen_bits(64, 32, 1.0),
        )

    def test_case_insensitive(self):
        np.testing.assert_array_equal(
            frozen_bits(64, 32, 1.0, "5g"), frozen_bits(64, 32, 1.0, "5G")
        )


class TestMaskHelpers:
    def test_mask_and_info(self):
        frozen = [0, 1, 2, 4]
        mask = frozen_bit_mask(8, frozen)
        assert mask.sum() == 4
        np.testing.assert_array_equal(info_indices(8, frozen), [3, 5, 6, 7])

    def test_split(self):
        left, right = split_frozen_bits([0, 1, 5, 6], 4)
        np.testing.assert_array_equal(left, [0, 1])
        np.testing.assert_array_equal(right, [1, 2])
