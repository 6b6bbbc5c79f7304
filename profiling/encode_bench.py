"""Profiling harness: A/B the Pallas fused butterfly encoder vs XLA on the real TPU.
Usage: python profiling/encode_bench.py [N ...]"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.encoder import PolarEncoder
    from polar_codes_tpu.models.detectors import CRC16
    from polar_codes_tpu.utils.timing import time_device_fn

    ns = [int(a) for a in sys.argv[1:]] or [1024, 4096, 32768]
    for n_len in ns:
        k_len = n_len // 2
        frozen = frozen_bits(n_len, k_len, 0.0, "BB")
        det = CRC16()
        batch = max(min((1 << 21) // n_len, 2048), 128)
        rng = np.random.default_rng(0)
        info = jnp.asarray(rng.integers(0, 2, (batch, k_len)), jnp.uint8)
        for backend in ("xla", "pallas"):
            enc = PolarEncoder(n_len, frozen, systematic=True, detector=det,
                               backend=backend)
            try:
                dt = time_device_fn(lambda x: enc.encode(x), info, reps=8)
            except Exception as exc:  # noqa: BLE001
                print(f"N={n_len} {backend}: FAIL {type(exc).__name__} "
                      f"{str(exc)[:200]}", flush=True)
                continue
            mbps = batch * n_len / dt / 1e6
            print(f"N={n_len} {backend}: {dt*1e6:.1f} us  "
                  f"{mbps:.0f} Mbit/s coded", flush=True)
        # cross-check on device
        e1 = PolarEncoder(n_len, frozen, systematic=True, detector=det)
        e2 = PolarEncoder(n_len, frozen, systematic=True, detector=det,
                          backend="pallas")
        a = np.asarray(e1.encode(info[:128]))
        b = np.asarray(e2.encode(info[:128]))
        print(f"N={n_len} bit-exact: {np.array_equal(a, b)}", flush=True)


if __name__ == "__main__":
    main()
