"""Bit-exact cross-validation against the reference C++ library.

tests/data/cc_*.bin were produced by running the actual reference sources
(ant-uni-bremen/polar-codes) through tests/data/crosscheck_generator.cpp on
this host: 64 deterministic blocks of (256,128) CRC8 systematic encoding
and noisy-LLR decoding with FastSscAvxFloat and SclAvxFloat L=8.

The north-star criterion "hard-decision outputs on identical LLR inputs
must match pypolar bit-exactly" (BASELINE.md) is checked here directly:
- encoder: bit-exact on all blocks
- Fast-SSC: bit-exact on all noisy blocks
- CA-SCL-8 with the reference's leaf/candidate structure (enum_span=0):
  identical block decisions on all blocks
(The default ENUM-leaf tree intentionally explores *exact* leaf candidate
sets and may legitimately pick different equally-or-better paths under
heavy noise; its BLER parity is covered by VALIDATION.md.)
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from polar_codes_tpu.construction import frozen_bits
from polar_codes_tpu.models.encoder import PolarEncoder
from polar_codes_tpu.models.fastssc import FastSSCDecoder
from polar_codes_tpu.models.scl import SCLDecoder
from polar_codes_tpu.models.detectors import CRC8

DATA = os.path.join(os.path.dirname(__file__), "data")
N_LEN, K_LEN, LIST, BLOCKS = 256, 128, 8, 64


@pytest.fixture(scope="module")
def fixtures():
    def bits(name, cols):
        raw = np.fromfile(os.path.join(DATA, name), dtype=np.uint8)
        return np.unpackbits(raw).reshape(BLOCKS, cols)

    return {
        "info": bits("cc_info.bin", K_LEN),
        "encoded": bits("cc_encoded.bin", N_LEN),
        "sc_out": bits("cc_sc_out.bin", K_LEN),
        "scl_out": bits("cc_scl_out.bin", K_LEN),
        "llr": np.fromfile(
            os.path.join(DATA, "cc_llr.bin"), dtype=np.float32
        ).reshape(BLOCKS, N_LEN),
    }


@pytest.fixture(scope="module")
def frozen():
    return frozen_bits(N_LEN, K_LEN, 0.0, "BB")


def test_encoder_bit_exact(fixtures, frozen):
    enc = PolarEncoder(N_LEN, frozen, systematic=True, detector=CRC8())
    got = np.asarray(enc.encode(jnp.asarray(fixtures["info"])))
    np.testing.assert_array_equal(got, fixtures["encoded"])


def test_fastssc_bit_exact_on_noisy_llrs(fixtures, frozen):
    dec = FastSSCDecoder(N_LEN, frozen, systematic=True)
    got, _, _ = dec.decode(jnp.asarray(fixtures["llr"]))
    np.testing.assert_array_equal(np.asarray(got), fixtures["sc_out"])


def test_ca_scl8_matches_reference_decisions(fixtures, frozen):
    dec = SCLDecoder(
        N_LEN, frozen, list_size=LIST, systematic=True, detector=CRC8(),
        enum_span=0,  # reference SSCL leaf/candidate structure
    )
    got, _, _ = dec.decode(jnp.asarray(fixtures["llr"]))
    match = (np.asarray(got) == fixtures["scl_out"]).all(axis=1)
    assert match.all(), f"only {match.mean() * 100:.1f}% blocks identical"


class TestAskModemCrosscheck:
    """Value-exact parity with the reference ASK modem (ask.cpp).

    tests/data/ask_*.bin were produced by tests/data/
    ask_crosscheck_generator.cpp compiled against the actual reference
    sources (modulate: cumulative-product Gray-ish mapping ask.cpp:70-80;
    demodulate: successive |.|-shift soft metrics :84-103)."""

    @pytest.mark.parametrize("bps", [2, 3])
    def test_modulate_value_exact(self, bps):
        from polar_codes_tpu.dsp import ask_modulate

        bits = np.fromfile(
            os.path.join(DATA, "ask_bits.bin"), np.float32
        ).astype(np.uint8)
        ref = np.fromfile(os.path.join(DATA, f"ask_mod_bps{bps}.bin"),
                          np.float32)
        got = np.asarray(ask_modulate(jnp.asarray(bits), bps))
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("bps", [2, 3])
    def test_demodulate_value_exact(self, bps):
        from polar_codes_tpu.dsp import ask_demodulate

        rx = np.fromfile(os.path.join(DATA, f"ask_rx_bps{bps}.bin"),
                         np.float32)
        ref = np.fromfile(os.path.join(DATA, f"ask_demod_bps{bps}.bin"),
                          np.float32)
        got = np.asarray(ask_demodulate(jnp.asarray(rx), bps))
        np.testing.assert_array_equal(got, ref)
