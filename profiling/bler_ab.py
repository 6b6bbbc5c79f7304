"""BLER/BER A/B at the flagship shape: pallas-f32 vs pallas-bf16 vs XLA.

Same encoded blocks and same noise on every arm (paired comparison) at
Eb/N0 = 2 dB, N=1024 K=512 CA-SCL-8 CRC16 — the bench.py operating point.
Used to qualify state-dtype and selection-path changes: BLER must agree
within Monte-Carlo confidence before a faster arm can become the default.

Usage: [BLOCKS=...] python profiling/bler_ab.py [arm ...]
Arms: xla, pallas (f32), pallas_bf16.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
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

    n_len, k_len, L = 1024, 512, 8
    ebn0_db = 2.0
    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    det = CRC16()
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)

    def make(arm):
        if arm == "xla":
            return SCLDecoder(n_len, frozen, list_size=L, systematic=True,
                              detector=det, backend="xla")
        dec = SCLDecoder(n_len, frozen, list_size=L, systematic=True,
                         detector=det, backend="pallas")
        if arm == "pallas_bf16":
            from polar_codes_tpu.ops.scl_kernel_bl import (
                build_bl_hybrid_decode_paths,
            )
            dec._pallas_fn = build_bl_hybrid_decode_paths(
                dec, batch_tile=dec._PALLAS_TILE,
                kernel_span=256, state_dtype=jnp.bfloat16,
            )
        elif arm == "pallas_nobp":
            # bitplane OFF (the pre-r3 select-chain bit state): paired
            # against the default 'pallas' arm (bitplane on at L>=8)
            # to requalify the bitplane path's BLER on hardware
            from polar_codes_tpu.ops.scl_kernel_bl import (
                build_bl_hybrid_decode_paths,
            )
            dec._pallas_fn = build_bl_hybrid_decode_paths(
                dec, batch_tile=dec._PALLAS_TILE,
                kernel_span=512, bitplane=False,
            )
        return dec

    arms = sys.argv[1:] or ["xla", "pallas", "pallas_bf16"]
    total = int(os.environ.get("BLOCKS", "131072"))
    chunk = 2048
    esn0 = 10.0 ** (ebn0_db / 10.0) * k_len / n_len

    decs = {a: make(a) for a in arms}
    stats = {a: [0, 0] for a in arms}  # block errs, bit errs
    rng = np.random.default_rng(123)
    for c in range(total // chunk):
        info = rng.integers(0, 2, (chunk, k_len)).astype(np.uint8)
        code = enc.encode(jnp.asarray(info))
        llr = add_awgn(jax.random.PRNGKey(1000 + c), bpsk_modulate(code),
                       esn0_linear=esn0)
        llr = jax.device_put(np.asarray(llr))
        # the encoder wrote the CRC into info's tail: compare payload only
        payload = info[:, : k_len - det.tail_bits]
        for a in arms:
            got, _, _ = decs[a].decode(llr)
            got = np.asarray(got)[:, : k_len - det.tail_bits]
            errs = got != payload
            stats[a][0] += int(errs.any(axis=-1).sum())
            stats[a][1] += int(errs.sum())
        if (c + 1) % 8 == 0:
            done = (c + 1) * chunk
            line = " | ".join(
                f"{a}: BLER {stats[a][0]/done:.3e} ({stats[a][0]})"
                for a in arms
            )
            print(f"{done} blocks: {line}", flush=True)
    payload_bits = k_len - det.tail_bits
    print("FINAL",
          {a: (stats[a][0] / total, stats[a][1] / (total * payload_bits))
           for a in arms}, flush=True)


if __name__ == "__main__":
    main()
