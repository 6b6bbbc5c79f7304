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
