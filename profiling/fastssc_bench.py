"""Profiling harness: A/B pallas vs xla Fast-SSC on the real TPU.
Usage: python profiling/fastssc_bench.py [N ...]"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.fastssc import FastSSCDecoder
    from polar_codes_tpu.utils.timing import time_device_fn

    ns = [int(a) for a in sys.argv[1:]] or [1024, 4096, 8192]
    for n_len in ns:
        k_len = n_len // 2
        frozen = frozen_bits(n_len, k_len, 0.0, "BB")
        batch = max(min((1 << 21) // n_len, 2048), 128)
        rng = np.random.default_rng(0)
        llr = jnp.asarray(rng.normal(0, 2, (batch, n_len)), jnp.float32)
        ref = None
        for backend in ("xla", "pallas"):
            dec = FastSSCDecoder(n_len, frozen, systematic=True,
                                 backend=backend)
            try:
                dt = time_device_fn(
                    lambda x: dec.decode_to_codeword(x), llr, reps=8
                )
            except Exception as exc:  # noqa: BLE001
                print(f"N={n_len} {backend}: FAIL {type(exc).__name__} "
                      f"{str(exc)[:200]}", flush=True)
                continue
            mbps = batch * n_len / dt / 1e6
            print(f"N={n_len} {backend}: {dt*1e6:.1f} us  "
                  f"{mbps:.0f} Mbit/s coded", flush=True)
            cw = np.asarray(dec.decode_to_codeword(llr[:128]))
            if ref is None:
                ref = cw
            else:
                print(f"N={n_len} bit-exact: {np.array_equal(cw, ref)}",
                      flush=True)


if __name__ == "__main__":
    main()
