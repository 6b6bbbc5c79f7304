"""A/B the sorted-heads merge prune vs the iterative extraction.

Times the full CA-SCL decode at N=1024 CRC16 B=1024 for L in {8, 16, 32}
with ops/scl_kernel_bl.py's merge_prune forced off/on, and checks the two
arms decode the SAME noisy blocks to identical info bits (the extraction
order is constructed to be identical; this verifies it on HW where float
reassociation could perturb near-ties).

Usage: [B=1024] [L=8,16,32] python profiling/merge_prune_ab.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(L, merge, n_len=1024, k_len=512):
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.scl import SCLDecoder
    from polar_codes_tpu.models.detectors import CRC16
    from polar_codes_tpu.ops.scl_kernel_bl import (
        build_bl_hybrid_decode_paths,
    )

    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    dec = SCLDecoder(n_len, frozen, list_size=L, systematic=True,
                     detector=CRC16(), backend="pallas")
    span = min(max(128, min(512, 4096 // max(L, 8))), n_len)
    dec._pallas_fn = build_bl_hybrid_decode_paths(
        dec, batch_tile=dec._PALLAS_TILE, kernel_span=span,
        state_dtype=jnp.float32, merge_prune=merge,
    )
    return dec


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.encoder import PolarEncoder
    from polar_codes_tpu.models.detectors import CRC16
    from polar_codes_tpu.dsp import bpsk_modulate, add_awgn
    from polar_codes_tpu.utils.timing import time_device_fn

    n_len, k_len = 1024, 512
    batch = int(os.environ.get("B", "1024"))
    ls = [int(x) for x in os.environ.get("L", "8,16,32").split(",")]
    det = CRC16()
    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (batch, k_len)).astype(np.uint8)
    code = enc.encode(jnp.asarray(info))
    esn0 = 10.0 ** 0.2 * k_len / n_len
    llr = jax.device_put(np.asarray(add_awgn(
        jax.random.PRNGKey(1), bpsk_modulate(code), esn0_linear=esn0)))

    for L in ls:
        outs = {}
        for merge in (False, True):
            dec = build(L, merge)
            out = np.asarray(dec.decode(llr)[0])
            dt = time_device_fn(lambda x, d=dec: d.decode(x)[1], llr)
            mbps = batch * (k_len - det.tail_bits) / dt / 1e6
            outs[merge] = out
            print(f"L={L:2d} merge={int(merge)}: {dt*1e3:.3f} ms  "
                  f"{mbps:.0f} Mbit/s", flush=True)
        diff = int(np.any(outs[False] != outs[True], axis=1).sum())
        print(f"L={L:2d} paired arm disagreement: {diff}/{batch} blocks",
              flush=True)


if __name__ == "__main__":
    main()
