"""End-to-end tests for the named benchmark configurations
(BASELINE.json "configs"): each must construct, encode, survive a noisy
channel at a sensible operating point, and decode through the public API."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polar_codes_tpu.construction import frozen_bits
from polar_codes_tpu.models import (
    PolarEncoder,
    FastSSCDecoder,
    SCLDecoder,
    Puncturer,
    make_detector,
)
from polar_codes_tpu.dsp import bpsk_modulate, add_awgn


def chain(enc, dec, det, k_len, batch, ebn0_db, rng, key=0):
    info = rng.integers(0, 2, (batch, k_len)).astype(np.uint8)
    sent = np.asarray(det.generate(jnp.asarray(info))) if det.tail_bits else info
    code = enc.encode(jnp.asarray(info))
    esn0 = 10 ** (ebn0_db / 10) * k_len / enc.block_length
    rx = add_awgn(jax.random.PRNGKey(key), bpsk_modulate(code), esn0_linear=esn0)
    decoded, _, ok = dec.decode(rx)
    bler = np.any(np.asarray(decoded) != sent, axis=1).mean()
    return bler, np.asarray(ok)


def test_config_readme_n64_sc_ber(rng):
    """N=64 K=40 SC decode, BB frozen bits (README pypolar example)."""
    n_len, k_len = 64, 40
    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    det = make_detector(0, "crc")
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    dec = FastSSCDecoder(n_len, frozen, systematic=True, detector=det)
    bler, _ = chain(enc, dec, det, k_len, 512, 5.0, rng)
    assert bler < 0.03  # (64,40) SC @5dB ~ 4e-3


def test_config_n128_systematic_punctured(rng):
    """N=128 K=64 systematic encode + SC decode with puncturing to M=96."""
    n_len, k_len, m_len = 128, 64, 96
    frozen = frozen_bits(n_len, k_len, 0.0)
    p = Puncturer(m_len, frozen)
    enc = PolarEncoder(n_len, frozen, systematic=True)
    dec = FastSSCDecoder(n_len, frozen, systematic=True)
    info = rng.integers(0, 2, (64, k_len)).astype(np.uint8)
    code = enc.encode(jnp.asarray(info))
    short = p.puncture(bpsk_modulate(code))
    esn0 = 10 ** 0.6 * k_len / m_len  # 6 dB on the punctured channel
    rx = add_awgn(jax.random.PRNGKey(2), short, esn0_linear=esn0)
    decoded, _, _ = dec.decode(p.depuncture(rx))
    bler = np.any(np.asarray(decoded) != info, axis=1).mean()
    assert bler < 0.2


def test_config_n1024_cascl8_crc16_sweep(rng):
    """N=1024 K=512 CA-SCL L=8 CRC16: the north-star configuration."""
    n_len, k_len = 1024, 512
    frozen = frozen_bits(n_len, k_len, 0.0)
    det = make_detector(16, "crc")
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    dec = SCLDecoder(n_len, frozen, list_size=8, systematic=True, detector=det)
    bler2, ok = chain(enc, dec, det, k_len, 256, 2.0, rng)
    assert bler2 < 0.05  # ~3e-3 at 2 dB (VALIDATION.md)


def test_config_5g_uplink_n512_crc11_scl8(rng):
    """5G NR-style config: N=512, NR reliability-table frozen bits,
    CRC11 (TS 38.212), SCL L=8."""
    n_len, k_len = 512, 256
    frozen = frozen_bits(n_len, k_len, 0.0, "5G")
    det = make_detector(11, "crcnr")
    assert det.name == "crc11nr" and det.tail_bits == 16
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    dec = SCLDecoder(n_len, frozen, list_size=8, systematic=True, detector=det)
    bler, ok = chain(enc, dec, det, k_len, 256, 2.5, rng)
    assert bler < 0.05
    assert ok.mean() > 0.9  # CRC-aided selection succeeds


@pytest.mark.slow
def test_config_n4096_cascl32_crc24(rng):
    """N=4096 K=2048 CA-SCL L=32 CRC24C: the large multi-host sweep shape
    (single-device here; the mesh path is covered by dryrun_multichip)."""
    n_len, k_len = 4096, 2048
    frozen = frozen_bits(n_len, k_len, 0.0)
    det = make_detector(24, "crc")
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    dec = SCLDecoder(n_len, frozen, list_size=32, systematic=True,
                     detector=det)
    bler, _ = chain(enc, dec, det, k_len, 16, 2.0, rng)
    assert bler < 0.5
