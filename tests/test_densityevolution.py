"""Tal-Vardy density-evolution construction tests.

Mirrors the reference's own sanity approach for FrozenBitPositionsDE:
compare the DE set against the BB/GA constructions
(/root/reference/python/frozen_bit_positions.py:269 comparison script).
"""

import numpy as np
import pytest

from polar_codes_tpu.construction import (
    aff3ct_frozen_bits,
    bhattacharyya_frozen_bits,
    frozen_bits,
    gaussian_approximation_frozen_bits,
    tal_vardy_error_probabilities,
    tal_vardy_frozen_bits,
)
from polar_codes_tpu.tools.strategies import get_frozen_bit_generator


class TestTalVardy:
    def test_basic_properties(self):
        f = tal_vardy_frozen_bits(128, 64, 0.0)
        assert f.shape == (64,)
        assert np.all(np.diff(f) > 0)  # sorted, unique
        assert f.min() >= 0 and f.max() < 128
        assert f[0] == 0  # channel 0 is always worst

    def test_pe_sane(self):
        pe = tal_vardy_error_probabilities(64, 0.0, mu=64)
        assert pe.shape == (64,)
        assert np.all(pe >= 0) and np.all(pe <= 0.5 + 1e-12)
        # fully-checked channel is the worst, fully-upgraded the best
        assert pe[0] == pe.max()
        assert pe[-1] == pe.min()
        # degraded quantization keeps Pe above the GA estimate ordering:
        # best channel should be essentially error-free at 0 dB, N=64
        assert pe[-1] < 1e-6

    def test_overlap_with_ga_and_bb(self):
        de = tal_vardy_frozen_bits(128, 64, 0.0)
        ga = gaussian_approximation_frozen_bits(128, 64, 0.0)
        bb = bhattacharyya_frozen_bits(128, 64, 0.0)
        assert len(np.intersect1d(de, ga)) / 64 >= 0.95
        assert len(np.intersect1d(de, bb)) / 64 >= 0.92

    def test_strategy_factory(self):
        gen = get_frozen_bit_generator("DE", 128, 64, 0.0)
        f = gen.frozen_bit_positions()
        np.testing.assert_array_equal(f, tal_vardy_frozen_bits(128, 64, 0.0))
        info = gen.info_bit_positions()
        assert info.size == 64
        assert np.intersect1d(f, info).size == 0

    def test_construction_frontend(self):
        f = frozen_bits(64, 32, 0.0, "DE")
        np.testing.assert_array_equal(f, tal_vardy_frozen_bits(64, 32, 0.0))


class TestAff3ctImport:
    def _write_table(self, path, n, sigma, positions):
        sub = path / str(int(np.log2(n)))
        sub.mkdir(parents=True, exist_ok=True)
        f = sub / f"N{n}_awgn_s{sigma:.3f}.pc"
        f.write_text(
            f"{n}\nawgn\n{sigma}\n" + " ".join(str(p) for p in positions) + "\n"
        )
        return f

    def test_import_and_sigma_selection(self, tmp_path):
        rng = np.random.default_rng(7)
        pos_a = rng.permutation(32)
        pos_b = rng.permutation(32)
        self._write_table(tmp_path, 32, 1.0, pos_a)  # matches dSNR=0
        self._write_table(tmp_path, 32, 0.5, pos_b)
        f = aff3ct_frozen_bits(32, 16, 0.0, path=str(tmp_path))
        np.testing.assert_array_equal(f, np.sort(pos_a[16:]))
        # dSNR=3dB -> sigma target 10^-0.3 = 0.501 -> second file
        f = aff3ct_frozen_bits(32, 16, 3.0, path=str(tmp_path))
        np.testing.assert_array_equal(f, np.sort(pos_b[16:]))

    def test_missing_path_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            aff3ct_frozen_bits(32, 16, 0.0, path=str(tmp_path / "nope"))
