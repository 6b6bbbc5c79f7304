"""Error-detection tests: known-answer vectors (mirroring the reference's
errordetectiontest.cpp and qa_pypolar_detector.py) plus affine-map
equivalence between the scalar engines and the batched device path."""

import numpy as np
import pytest
import jax.numpy as jnp

from polar_codes_tpu.models.detectors import (
    CRC8,
    CRC16,
    CRC32,
    CRC6NR,
    CRC11NR,
    CRC16NR,
    CRC24NRC,
    CMAC,
    Dummy,
    crc_msb_first,
    crc32c_bytes,
    make_detector,
)
from polar_codes_tpu.utils.aes import aes128_encrypt_block, aes_cmac


def bits_of(data: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(data, dtype=np.uint8))


class TestScalarEngines:
    def test_crc16_ccitt_false_check_value(self):
        # standard check: CRC16/CCITT-FALSE("123456789") = 0x29B1
        assert crc_msb_first(bits_of(b"123456789"), 0x1021, 16, 0xFFFF) == 0x29B1

    def test_crc16_xmodem_check_value(self):
        # CRC16/XMODEM("123456789") = 0x31C3
        assert crc_msb_first(bits_of(b"123456789"), 0x1021, 16, 0x0000) == 0x31C3

    def test_crc32c_check_value(self):
        # CRC-32C("123456789") with init 0 / no xorout:
        # standard CRC-32C (init ~0, xorout ~0) is 0xE3069283;
        # the raw variant equals ~crc32c_std(~pattern...) — instead pin the
        # _mm_crc32-chain semantics with a direct independent computation.
        import zlib  # zlib is crc32 (not c); use bit-level reference instead

        def ref_crc32c_raw(data):
            poly = 0x82F63B78
            reg = 0
            for byte in data:
                reg ^= byte
                for _ in range(8):
                    reg = (reg >> 1) ^ (poly if reg & 1 else 0)
            return reg

        assert crc32c_bytes(b"123456789") == ref_crc32c_raw(b"123456789")
        assert crc32c_bytes(b"\x00" * 8) == 0

    def test_crc6_nr_zero_and_linearity(self):
        assert crc_msb_first(np.zeros(24, np.uint8), 0x21, 6, 0) == 0
        a = np.random.default_rng(1).integers(0, 2, 24).astype(np.uint8)
        b = np.random.default_rng(2).integers(0, 2, 24).astype(np.uint8)
        ca = crc_msb_first(a, 0x21, 6, 0)
        cb = crc_msb_first(b, 0x21, 6, 0)
        cab = crc_msb_first(a ^ b, 0x21, 6, 0)
        assert cab == ca ^ cb


class TestAes:
    def test_fips197_vector(self):
        key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
        assert aes128_encrypt_block(key, pt) == ct

    def test_rfc4493_cmac_vectors(self):
        key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
        # Example 1: empty message
        assert aes_cmac(key, b"") == bytes.fromhex(
            "bb1d6929e95937287fa37d129b756746"
        )
        # Example 2: 16-byte message (cited in reference cmac.cpp comments)
        msg = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
        assert aes_cmac(key, msg) == bytes.fromhex(
            "070a16b46b4d4144f79bdd9dd04a287c"
        )
        # Example 3: 40-byte message
        msg40 = bytes.fromhex(
            "6bc1bee22e409f96e93d7e117393172a"
            "ae2d8a571e03ac9c9eb76fac45af8e51"
            "30c81c46a35ce411"
        )
        assert aes_cmac(key, msg40) == bytes.fromhex(
            "dfa66747de9ae63030ca32611497c827"
        )


class TestDetectors:
    @pytest.mark.parametrize(
        "det,k_bits",
        [
            (CRC8(), 64),
            (CRC16(), 64),
            (CRC16NR(), 64),
            (CRC6NR(), 48),
            (CRC11NR(), 48),
            (CRC24NRC(), 96),
            (CRC32(), 96),
        ],
    )
    def test_generate_then_check_roundtrip(self, det, k_bits, rng):
        block = rng.integers(0, 2, k_bits).astype(np.uint8)
        filled = det.generate_np(block)
        assert det.check_np(filled)
        # flipping any bit breaks the check
        bad = filled.copy()
        bad[3] ^= 1
        assert not det.check_np(bad)

    @pytest.mark.parametrize(
        "det,k_bits",
        [
            (CRC8(), 64),
            (CRC16(), 64),
            (CRC16NR(), 64),
            (CRC6NR(), 48),
            (CRC11NR(), 48),
            (CRC24NRC(), 96),
            (CRC32(), 96),
        ],
    )
    def test_device_path_matches_scalar(self, det, k_bits, rng):
        blocks = rng.integers(0, 2, (16, k_bits)).astype(np.uint8)
        want = np.stack([det.generate_np(b) for b in blocks])
        got = np.asarray(det.generate(jnp.asarray(blocks)))
        np.testing.assert_array_equal(got, want)
        ok = np.asarray(det.check(jnp.asarray(want)))
        assert ok.all()
        # corrupt half the rows
        bad = want.copy()
        bad[::2, 5] ^= 1
        ok2 = np.asarray(det.check(jnp.asarray(bad)))
        np.testing.assert_array_equal(ok2, np.arange(16) % 2 == 1)

    def test_odd_bit_lengths_nr(self, rng):
        """5G NR CRCs operate on arbitrary bit counts (qa_pypolar_detector)."""
        det = CRC11NR()
        for d_bits in (13, 29, 41):
            value = crc_msb_first(
                rng.integers(0, 2, d_bits).astype(np.uint8), 0x621, 11, 0
            )
            assert 0 <= value < 2048

    def test_dummy_always_valid(self, rng):
        det = Dummy()
        assert det.check_np(rng.integers(0, 2, 32).astype(np.uint8))
        assert np.asarray(det.check(jnp.zeros((4, 32), jnp.uint8))).all()

    def test_cmac_detector(self, rng):
        det = CMAC(32)
        block = rng.integers(0, 2, 128).astype(np.uint8)
        filled = det.generate_np(block)
        assert det.check_np(filled)
        bad = filled.copy()
        bad[0] ^= 1
        assert not det.check_np(bad)


class TestFactory:
    def test_sizes(self):
        assert isinstance(make_detector(0, "crc"), Dummy)
        assert isinstance(make_detector(6, "crc"), CRC6NR)
        assert isinstance(make_detector(8, "crc"), CRC8)
        assert isinstance(make_detector(11, "crc"), CRC11NR)
        assert isinstance(make_detector(16, "crc"), CRC16)
        assert isinstance(make_detector(16, "crc-nr"), CRC16NR)
        assert isinstance(make_detector(24, "crc"), CRC24NRC)
        assert isinstance(make_detector(32, "crc"), CRC32)
        assert isinstance(make_detector(32, "cmac"), CMAC)

    def test_invalid(self):
        with pytest.raises(ValueError):
            make_detector(7, "crc")
        with pytest.raises(ValueError):
            make_detector(12, "cmac")
        with pytest.raises(ValueError):
            make_detector(8, "nonsense")


class TestCmacDevicePath:
    def test_cmac_through_jitted_codec(self, rng):
        """CMAC runs as a host callback under jit (the reference's
        physical-layer-security configuration, cmac.cpp)."""
        import jax
        import jax.numpy as jnp
        from polar_codes_tpu.construction import frozen_bits
        from polar_codes_tpu.models.encoder import PolarEncoder
        from polar_codes_tpu.models.fastssc import FastSSCDecoder
        from polar_codes_tpu.models.detectors import CMAC
        from polar_codes_tpu.dsp import bpsk_modulate

        n_len, k_len = 128, 64
        frozen = frozen_bits(n_len, k_len, 0.0)
        det = CMAC(32)
        enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
        dec = FastSSCDecoder(n_len, frozen, systematic=True, detector=det)
        info = rng.integers(0, 2, (8, k_len)).astype(np.uint8)
        llr = np.array(bpsk_modulate(enc.encode(jnp.asarray(info))) * 8.0)
        _, _, ok = jax.jit(dec.decode)(jnp.asarray(llr))
        assert np.asarray(ok).all()
        llr[0] = -llr[0]
        _, _, ok2 = jax.jit(dec.decode)(jnp.asarray(llr))
        assert not np.asarray(ok2)[0] and np.asarray(ok2)[1:].all()
