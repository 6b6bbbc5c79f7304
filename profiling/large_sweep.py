"""Profiling harness: batch/chunk sweep of the scan-over-schedule decoders on the
real TPU. The r2 grid measured sc_scan N=131072 at batch 16 =
12 Mbit/s info with hbm_util 0.02 — dispatch-bound, so batch should be
nearly free throughput.

Usage: python profiling/large_sweep.py sc 131072 16 128 512
       python profiling/large_sweep.py scl 32768 64 256
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.large import LargeSCDecoder, LargeSCLDecoder
    from polar_codes_tpu.models.detectors import CRC16
    from polar_codes_tpu.utils.timing import time_device_fn

    kind = sys.argv[1]
    n_len = int(sys.argv[2])
    batches = [int(b) for b in sys.argv[3:]] or [16, 128]
    k_len = n_len // 2
    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    chunks = ([512, 2048] if kind == "sc"
              else [int(c) for c in _os.environ.get(
                  "CHUNKS", "256,512").split(",")])
    for chunk in chunks:
        if kind == "sc":
            dec = LargeSCDecoder(n_len, frozen, systematic=True, chunk=chunk)
        else:
            # r4 production configuration (sim/benchmark.py cascl_scan
            # pallas row): bf16 stage-LLR carry, unroll=16
            dec = LargeSCLDecoder(n_len, frozen, list_size=8,
                                  systematic=True, detector=CRC16(),
                                  chunk=chunk, backend="pallas",
                                  unroll=16, carry_dtype=jnp.bfloat16)
        for batch in batches:
            rng = np.random.default_rng(0)
            llr = jnp.asarray(rng.normal(0, 2, (batch, n_len)), jnp.float32)
            try:
                dt = time_device_fn(lambda x: dec.decode(x)[1], llr, reps=3)
            except Exception as exc:  # noqa: BLE001
                print(f"chunk={chunk} B={batch}: FAIL {exc}", flush=True)
                break
            mbps = batch * k_len / dt / 1e6
            print(f"chunk={chunk} B={batch}: {dt*1e3:.1f} ms "
                  f"{mbps:.1f} Mbit/s info", flush=True)


if __name__ == "__main__":
    main()
