"""Profiling harness: break down the Pallas hybrid SCL decode into kernel vs glue time
on the real TPU, and A/B tile/span variants.

Usage:
  python profiling/kernel_profile.py split          # per-subtree-kernel timing
  python profiling/kernel_profile.py head 128x256 256x256 128x512 ...
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import numpy as np


def setup(tile=128, span=None, dtype=None):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.encoder import PolarEncoder
    from polar_codes_tpu.models.scl import SCLDecoder
    from polar_codes_tpu.models.detectors import CRC16
    from polar_codes_tpu.dsp import bpsk_modulate, add_awgn

    n_len, k_len, L = 1024, 512, 8
    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    det = CRC16()
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    dec = SCLDecoder(n_len, frozen, list_size=L, systematic=True,
                     detector=det, backend="pallas",
                     dtype=dtype or jnp.float32,
                     pallas_tile=tile, pallas_span=span)
    batch = int(os.environ.get("B", "1024"))
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (batch, k_len)).astype(np.uint8)
    code = enc.encode(jnp.asarray(info))
    esn0 = 10.0 ** 0.2 * k_len / n_len
    llr = add_awgn(jax.random.PRNGKey(1), bpsk_modulate(code),
                   esn0_linear=esn0)
    llr = jax.device_put(np.asarray(llr))
    return dec, llr, batch, k_len, det


def tfn(fn, x, reps=6):
    from polar_codes_tpu.utils.timing import time_device_fn
    return time_device_fn(fn, x, reps=reps)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "head"
    if mode == "head":
        import jax.numpy as jnp
        variants = sys.argv[2:] or ["128x256"]
        for v in variants:
            try:
                parts = v.split("x")
                tile, span = int(parts[0]), int(parts[1])
                dtype = jnp.float32
                if "bf16" in parts[2:]:
                    dtype = jnp.bfloat16
                elif "char" in parts[2:]:
                    dtype = jnp.int8
                dec, llr, batch, k_len, det = setup(tile, span, dtype)
                if dtype == jnp.bfloat16:
                    llr = llr.astype(jnp.bfloat16)
                elif dtype == jnp.int8:
                    import numpy as _np
                    llr = jnp.asarray(_np.clip(_np.round(
                        _np.asarray(llr) * 8.0), -127, 127).astype(_np.int8))
                dt = tfn(lambda x: dec.decode(x)[1], llr)
                mbps = batch * (k_len - det.tail_bits) / dt / 1e6
                print(f"{v}: {dt*1e3:.3f} ms  {mbps:.0f} Mbit/s", flush=True)
            except Exception as exc:  # noqa: BLE001 - report and continue
                print(f"{v}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:160]}", flush=True)
    elif mode == "ksplit":
        # compile each subtree kernel separately (dtype from argv[2]) to
        # localize Mosaic failures that only the full pipeline shows
        import jax
        import jax.numpy as jnp
        dtype = jnp.bfloat16 if (len(sys.argv) > 2 and
                                 sys.argv[2] == "bf16") else jnp.float32
        dec, llr, batch, k_len, det = setup(dtype=dtype)
        fn = dec._build_pallas()
        import jax.tree_util  # noqa: F401
        # trace only (no run) to populate subtree_info
        jax.eval_shape(fn.raw, jax.ShapeDtypeStruct(llr.shape, dtype))
        for i, (node, w_in, w_out, call) in enumerate(fn.subtree_info):
            kinds = [leaf.kind.name for leaf in node.leaves()]
            x = jnp.asarray(
                np.random.default_rng(i).normal(
                    0, 2, (w_in, node.length, batch)
                ), dtype)
            m = jnp.zeros((batch, w_in), jnp.float32)
            try:
                r = jax.block_until_ready(call(x, m)[2])
                print(f"kernel {i}: span={node.length} w={w_in}->{w_out} "
                      f"leaves={len(kinds)}: ok", flush=True)
            except Exception as exc:  # noqa: BLE001
                from collections import Counter
                print(f"kernel {i}: span={node.length} w={w_in}->{w_out} "
                      f"{dict(Counter(kinds))}: FAIL "
                      f"{type(exc).__name__}: {str(exc)[:120]}", flush=True)
    elif mode == "split":
        import jax
        import jax.numpy as jnp
        dec, llr, batch, k_len, det = setup()
        fn = dec._build_pallas()
        _ = jax.block_until_ready(fn.raw(llr)[1])  # trace -> subtree_info
        dt = tfn(lambda x: fn.raw(x)[1], llr)
        print(f"full raw:    {dt*1e3:.3f} ms", flush=True)
        dt2 = tfn(lambda x: dec.decode(x)[1], llr)
        print(f"full decode: {dt2*1e3:.3f} ms (CRC select {(dt2-dt)*1e3:.3f})",
              flush=True)
        total_k = 0.0
        for i, (node, w_in, w_out, call) in enumerate(fn.subtree_info):
            x = jnp.asarray(
                np.random.default_rng(i).normal(
                    0, 2, (w_in, node.length, batch)
                ), jnp.float32)
            m = jnp.zeros((batch, w_in), jnp.float32)
            dtk = tfn(lambda a: call(a, m)[2], x)
            total_k += dtk
            print(f"kernel {i}: span={node.length} w={w_in}->{w_out} "
                  f"kind={node.kind.name}: {dtk*1e3:.3f} ms", flush=True)
        print(f"kernels total {total_k*1e3:.3f} ms; "
              f"glue ~{(dt-total_k)*1e3:.3f} ms", flush=True)
    else:
        print("unknown mode")


if __name__ == "__main__":
    main()
