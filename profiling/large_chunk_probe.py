"""Probe: Mosaic compile time + runtime of the masked-SC/SCL chunk kernels
at larger chunk sizes, then full LargeSCDecoder/LargeSCLDecoder timing with
backend="pallas" at those chunks.

The scan decoders are per-step dispatch-bound (PERF.md sc_scan); doubling
the chunk halves the scan steps. The open question is whether the fully
unrolled Mosaic recursion still compiles in bounded time at 2M-1 ~ 4k ops.

Usage: python profiling/large_chunk_probe.py kernel sc 1024 2048
       python profiling/large_chunk_probe.py full sc 131072 128 512 1024 2048
       python profiling/large_chunk_probe.py full scl 32768 64 256 512
"""
import os as _os, sys as _sys, time
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.utils.timing import time_device_fn

    mode = sys.argv[1]
    kind = sys.argv[2]
    if mode == "kernel":
        from polar_codes_tpu.ops.large_kernel import (
            build_masked_sc_chunk_kernel, build_masked_scl_chunk_kernel)
        for chunk in [int(c) for c in sys.argv[3:]]:
            rng = np.random.default_rng(0)
            if kind == "sc":
                fn = jax.jit(build_masked_sc_chunk_kernel(chunk))
                llr = jnp.asarray(rng.normal(0, 2, (128, chunk)), jnp.float32)
                mask = jnp.asarray(rng.random(chunk) < 0.5, jnp.float32)
                t0 = time.perf_counter()
                out = fn(llr, mask)
                jax.block_until_ready(out)
                tc = time.perf_counter() - t0
                dt = time_device_fn(lambda x: fn(x, mask)[0], llr, reps=20)
            else:
                n_list = 8
                fn = jax.jit(build_masked_scl_chunk_kernel(chunk, n_list))
                llr = jnp.asarray(
                    rng.normal(0, 2, (128, n_list, chunk)), jnp.float32)
                mask = jnp.asarray(rng.random(chunk) < 0.5, jnp.float32)
                mets = jnp.zeros((128, n_list), jnp.float32)
                t0 = time.perf_counter()
                out = fn(llr, mask, mets)
                jax.block_until_ready(out)
                tc = time.perf_counter() - t0
                dt = time_device_fn(lambda x: fn(x, mask, mets)[0], llr,
                                    reps=20)
            print(f"{kind} chunk={chunk}: compile {tc:.1f}s, "
                  f"run {dt*1e6:.0f} us", flush=True)
    else:
        from polar_codes_tpu.construction import frozen_bits
        from polar_codes_tpu.models.large import (
            LargeSCDecoder, LargeSCLDecoder)
        from polar_codes_tpu.models.detectors import CRC16
        n_len = int(sys.argv[3])
        batch = int(sys.argv[4])
        k_len = n_len // 2
        frozen = frozen_bits(n_len, k_len, 0.0, "BB")
        for chunk in [int(c) for c in sys.argv[5:]]:
            if kind == "sc":
                dec = LargeSCDecoder(n_len, frozen, systematic=True,
                                     chunk=chunk, backend="pallas")
            else:
                dec = LargeSCLDecoder(n_len, frozen, list_size=8,
                                      systematic=True, detector=CRC16(),
                                      chunk=chunk, backend="pallas")
            rng = np.random.default_rng(0)
            llr = jnp.asarray(rng.normal(0, 2, (batch, n_len)), jnp.float32)
            t0 = time.perf_counter()
            try:
                dt = time_device_fn(lambda x: dec.decode(x)[1], llr, reps=3)
            except Exception as exc:  # noqa: BLE001
                print(f"{kind} chunk={chunk} B={batch}: FAIL {exc}",
                      flush=True)
                continue
            tc = time.perf_counter() - t0
            mbps = batch * k_len / dt / 1e6
            print(f"{kind} chunk={chunk} B={batch}: {dt*1e3:.1f} ms "
                  f"{mbps:.1f} Mbit/s info (setup {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
