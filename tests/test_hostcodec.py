"""Native hostcodec library tests: C++ results vs NumPy/JAX references."""

import numpy as np
import pytest

from polar_codes_tpu.utils import hostcodec


pytestmark = pytest.mark.skipif(
    not hostcodec.available(), reason="no C++ toolchain for hostcodec"
)


def test_crc_matches_python_engine(rng):
    from polar_codes_tpu.models.detectors import crc_msb_first

    for poly, width, init in ((0x07, 8, 0), (0x1021, 16, 0xFFFF),
                              (0x21, 6, 0), (0xB2B117, 24, 0)):
        bits = rng.integers(0, 2, 123).astype(np.uint8)
        assert hostcodec.crc_msb_first(bits, poly, width, init) == crc_msb_first(
            bits, poly, width, init
        )


def test_crc_rows_batched(rng):
    from polar_codes_tpu.models.detectors import crc_msb_first

    bits = rng.integers(0, 2, (16, 64)).astype(np.uint8)
    got = hostcodec.crc_rows(bits, 0x07, 8, 0)
    want = [crc_msb_first(row, 0x07, 8, 0) for row in bits]
    np.testing.assert_array_equal(got, want)


def test_crc32c_matches_python(rng):
    from polar_codes_tpu.models.detectors import crc32c_bytes

    blob = bytes(rng.integers(0, 256, 57).astype(np.uint8))
    assert hostcodec.crc32c_bytes(blob) == crc32c_bytes(blob)


def test_butterfly_matches_jax(rng):
    import jax.numpy as jnp
    from polar_codes_tpu.ops.butterfly import butterfly_transform

    bits = rng.integers(0, 2, (8, 64)).astype(np.uint8)
    got = hostcodec.butterfly_rows(bits)
    want = np.asarray(butterfly_transform(jnp.asarray(bits)))
    np.testing.assert_array_equal(got, want)


def test_pack_gather_scatter_roundtrip(rng):
    lib = hostcodec.load()
    bits = rng.integers(0, 2, 64).astype(np.uint8)
    packed = np.zeros(8, np.uint8)
    lib.hc_pack_bits(np.ascontiguousarray(bits), 64, packed)
    np.testing.assert_array_equal(packed, np.packbits(bits))
    unpacked = np.zeros(64, np.uint8)
    lib.hc_unpack_bits(packed, 64, unpacked)
    np.testing.assert_array_equal(unpacked, bits)

    pos = np.sort(rng.choice(64, 32, replace=False)).astype(np.int64)
    gathered = np.zeros((1, 32), np.uint8)
    lib.hc_gather_bits(bits[None].copy(), 64, 1, pos, 32, gathered)
    np.testing.assert_array_equal(gathered[0], bits[pos])
    scattered = np.zeros((1, 64), np.uint8)
    lib.hc_scatter_bits(gathered, 32, 1, pos, 64, scattered)
    np.testing.assert_array_equal(scattered[0, pos], bits[pos])


def test_cmac_rows_matches_rfc4493_and_python(rng):
    """Native batched CMAC (libcrypto) == pure-Python RFC 4493, plus the
    RFC's own AES-128 test vectors."""
    from polar_codes_tpu.utils import hostcodec
    from polar_codes_tpu.utils.aes import aes_cmac

    if not hostcodec.cmac_available():
        import pytest

        pytest.skip("libcrypto CMAC engine unavailable")
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    vectors = [
        ("", "bb1d6929e95937287fa37d129b756746"),
        ("6bc1bee22e409f96e93d7e117393172a",
         "070a16b46b4d4144f79bdd9dd04a287c"),
        ("6bc1bee22e409f96e93d7e117393172aae2d8a571e03ac9c"
         "9eb76fac45af8e5130c81c46a35ce411",
         "dfa66747de9ae63030ca32611497c827"),
    ]
    for msg_hex, tag_hex in vectors[1:]:  # batched API needs equal rows
        msgs = np.frombuffer(bytes.fromhex(msg_hex), np.uint8)[None, :]
        tags = hostcodec.cmac_rows(key, msgs)
        assert tags.tobytes().hex() == tag_hex
    msgs = rng.integers(0, 256, (16, 62), dtype=np.uint8)
    tags = hostcodec.cmac_rows(key, msgs)
    for i in range(16):
        assert tags[i].tobytes() == aes_cmac(key, msgs[i].tobytes())
