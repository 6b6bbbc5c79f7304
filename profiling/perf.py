"""Profiling harness: compare SCL decode variants on the real TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import json
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.encoder import PolarEncoder
    from polar_codes_tpu.models.scl import SCLDecoder
    from polar_codes_tpu.models.detectors import CRC16
    from polar_codes_tpu.dsp import bpsk_modulate, add_awgn
    from polar_codes_tpu.utils.timing import time_device_fn

    n_len, k_len, L = 1024, 512, 8
    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    det = CRC16()
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    batch = int(os.environ.get("B", "1024"))
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (batch, k_len)).astype(np.uint8)
    code = enc.encode(jnp.asarray(info))
    esn0 = 10.0 ** 0.2 * k_len / n_len
    llr = add_awgn(jax.random.PRNGKey(1), bpsk_modulate(code), esn0_linear=esn0)
    llr = jax.device_put(np.asarray(llr))

    which = sys.argv[1:] or ["f32"]
    payload = batch * (k_len - det.tail_bits)
    for name in which:
        kw = dict(list_size=L, systematic=True, detector=det)
        if name == "f32":
            dec = SCLDecoder(n_len, frozen, **kw)
            x = llr
        elif name == "bf16":
            dec = SCLDecoder(n_len, frozen, dtype=jnp.bfloat16, **kw)
            x = llr.astype(jnp.bfloat16)
        elif name == "i8":
            dec = SCLDecoder(n_len, frozen, dtype=jnp.int8, **kw)
            x = jnp.clip(jnp.round(llr * 8.0), -127, 127).astype(jnp.int8)
        elif name == "f32bl":
            dec = SCLDecoder(n_len, frozen, layout="batch_last", **kw)
            x = llr
        elif name.startswith("enum"):
            span = int(name[4:].split("k")[0])
            kk = int(name.split("k")[1])
            dec = SCLDecoder(n_len, frozen, enum_span=span, max_enum_k=kk, **kw)
            x = llr
        else:
            raise SystemExit(f"unknown variant {name}")
        t = time_device_fn(lambda v: dec.decode(v), x, reps=8)
        print(json.dumps({
            "variant": name, "batch": batch, "ms": round(t * 1e3, 3),
            "mbps": round(payload / t / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
