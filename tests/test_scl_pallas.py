"""Pallas whole-tree SCL kernel: interpret-mode equivalence with the XLA
implementation (the TPU compile path is exercised on hardware by bench)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polar_codes_tpu.construction import frozen_bits
from polar_codes_tpu.models.scl import SCLDecoder
from polar_codes_tpu.models.detectors import CRC16
from polar_codes_tpu.ops.scl_kernel import build_pallas_decode_paths


@pytest.mark.parametrize("n_len,k_len,list_size", [(64, 40, 4), (256, 128, 8)])
def test_interpret_matches_xla(n_len, k_len, list_size, rng):
    frozen = frozen_bits(n_len, k_len, 0.0)
    dec = SCLDecoder(n_len, frozen, list_size=list_size, detector=CRC16())
    fn = build_pallas_decode_paths(dec, batch_tile=8, interpret=True)
    llr = jnp.asarray(rng.normal(0, 2, (16, n_len)), jnp.float32)
    cw_ref, m_ref, _ = dec.decode_paths(llr)
    cw, m = fn(llr)
    np.testing.assert_allclose(
        np.asarray(m), np.asarray(m_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(cw), np.asarray(cw_ref))


def test_interpret_all_leaf_kinds(rng):
    # a code whose tree exercises rate0/rate1/rep/spc/enum leaves at once
    n_len = 64
    frozen = sorted(
        set(
            list(range(16))            # rate-0 subtree
            + [16, 17, 18, 20, 24]     # mixed -> enum leaves
            + [32, 33, 34, 35, 36, 37, 38]  # rep-ish
            + [48]                     # spc-ish
        )
    )
    dec = SCLDecoder(n_len, frozen, list_size=4, enum_span=8, max_enum_k=3)
    kinds = {leaf.kind.value for leaf in dec.tree.leaves()}
    fn = build_pallas_decode_paths(dec, batch_tile=8, interpret=True)
    llr = jnp.asarray(rng.normal(0, 2, (8, n_len)), jnp.float32)
    cw_ref, m_ref, _ = dec.decode_paths(llr)
    cw, m = fn(llr)
    np.testing.assert_allclose(
        np.asarray(m), np.asarray(m_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(cw), np.asarray(cw_ref))
    assert len(kinds) >= 3  # tree actually mixes leaf types
