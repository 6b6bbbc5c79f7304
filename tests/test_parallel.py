"""Mesh parallelism tests on the virtual 8-device CPU mesh: sharded
Monte-Carlo counters must psum-aggregate correctly and be independent of
the mesh size for the same per-device work."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polar_codes_tpu.construction import frozen_bits
from polar_codes_tpu.models.encoder import PolarEncoder
from polar_codes_tpu.models.fastssc import FastSSCDecoder
from polar_codes_tpu.models.detectors import CRC8
from polar_codes_tpu.parallel.mesh import default_mesh, sharded_counter_step
from polar_codes_tpu.sim.montecarlo import MonteCarlo


@pytest.fixture(scope="module")
def codec():
    n_len, k_len = 64, 32
    frozen = frozen_bits(n_len, k_len, 0.0)
    det = CRC8()
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    dec = FastSSCDecoder(n_len, frozen, systematic=True, detector=det)
    return enc, dec


def test_default_mesh_sizes():
    mesh = default_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh2 = default_mesh(4)
    assert mesh2.devices.size == 4
    with pytest.raises(ValueError):
        default_mesh(10_000)


def test_sharded_counter_step_psums():
    mesh = default_mesh(8)

    def step(key, scale):
        v = jax.random.randint(key, (), 1, 10)
        return {"v": v * 0 + 1, "s": scale.astype(jnp.int32)}

    lifted = sharded_counter_step(step, mesh)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    out = lifted(keys, jnp.float32(3))
    assert int(out["v"]) == 8  # one per device, psum-reduced
    assert int(out["s"]) == 24


def test_mesh_montecarlo_counts_all_devices(codec):
    enc, dec = codec
    mesh = default_mesh(8)
    mc = MonteCarlo(enc, dec, batch=16, mesh=mesh)
    r = mc.run_job(3.0, 16 * 8 * 2, warmup=False)
    assert r.runs == 16 * 8 * 2  # two chunks x 8 devices x 16 blocks
    assert 0 <= r.BLER <= 1


def test_mesh_and_single_device_agree_statistically(codec):
    """Same total blocks at the same SNR: error rates must agree within
    Monte-Carlo tolerance (different PRNG streams, same physics)."""
    enc, dec = codec
    mesh = default_mesh(8)
    blocks = 128 * 8
    mc_mesh = MonteCarlo(enc, dec, batch=128, mesh=mesh)
    mc_one = MonteCarlo(enc, dec, batch=1024)
    r_m = mc_mesh.run_job(2.0, blocks, warmup=False)
    r_1 = mc_one.run_job(2.0, blocks, warmup=False)
    assert r_m.runs == r_1.runs == blocks
    assert abs(r_m.BLER - r_1.BLER) < 0.12
    assert r_m.BLER > 0.01  # operating point produces errors
