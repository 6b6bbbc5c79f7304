"""Paired A/B qualifying the bf16 stage-LLR carry of LargeSCLDecoder.

Same encoded blocks, same noise on both arms (carry_dtype=None i.e. f32,
vs bfloat16) at Eb/N0 = 1.5 dB — the operating point of the large-N grid
rows. Discipline matches the bitplane/adaptive A/Bs (VALIDATION.md):
>= 65536 paired blocks, reporting per-arm block/bit errors AND the count
of blocks where the two arms decode differently.

The 65536-block bulk runs at N=4096 (the same scan-over-schedule carry
machinery — 16 chunks of 256 — at ~7x the block rate of N=32768); a
4096-block paired spot-check runs at the production N=32768 shape.

Usage: [BLOCKS=65536] [N=4096] [SPOT=4096] python profiling/large_bf16_ab.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import numpy as np


def run_pair(n_len, total, chunk_blocks, ebn0_db=1.5):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.encoder import PolarEncoder
    from polar_codes_tpu.models.large import LargeSCLDecoder
    from polar_codes_tpu.models.detectors import CRC16
    from polar_codes_tpu.dsp import bpsk_modulate, add_awgn

    k_len = n_len // 2
    det = CRC16()
    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det,
                       backend="xla")
    # backend: pallas is the shipped config, but the tunneled remote
    # compiler hangs (>20 min, no error) on FRESH large-scan pallas
    # modules (r5); the carry rounding under test is identical on the
    # XLA chunk backend (the casts live in the scan carry, not the
    # chunk kernels), so BACKEND=xla qualifies the same precision class
    backend = os.environ.get("BACKEND", "pallas")
    unroll = 16 if backend == "pallas" else 4
    decs = {}
    for name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
        decs[name] = LargeSCLDecoder(
            n_len, frozen, list_size=8, systematic=True, detector=det,
            chunk=256, backend=backend, unroll=unroll, carry_dtype=cd,
        )
    esn0 = 10.0 ** (ebn0_db / 10.0) * k_len / n_len
    payload_len = k_len - det.tail_bits
    stats = {a: [0, 0] for a in decs}
    differ = 0
    rng = np.random.default_rng(321)
    steps = max(total // chunk_blocks, 1)
    for c in range(steps):
        info = rng.integers(0, 2, (chunk_blocks, k_len)).astype(np.uint8)
        code = enc.encode(jnp.asarray(info))
        llr = add_awgn(jax.random.PRNGKey(5000 + c), bpsk_modulate(code),
                       esn0_linear=esn0)
        llr = jax.device_put(np.asarray(llr))
        payload = info[:, :payload_len]
        outs = {}
        for a, dec in decs.items():
            got = np.asarray(dec.decode(llr)[0])[:, :payload_len]
            outs[a] = got
            errs = got != payload
            stats[a][0] += int(errs.any(axis=-1).sum())
            stats[a][1] += int(errs.sum())
        differ += int((outs["f32"] != outs["bf16"]).any(axis=-1).sum())
        done = (c + 1) * chunk_blocks
        if (c + 1) % 4 == 0 or c == steps - 1:
            line = " | ".join(
                f"{a}: blkerr {stats[a][0]} biterr {stats[a][1]}"
                for a in decs)
            print(f"N={n_len} {done} blocks: {line} | "
                  f"arm-differing blocks {differ}", flush=True)
    print(f"FINAL N={n_len} blocks={steps * chunk_blocks} "
          f"f32=(blk {stats['f32'][0]}, bit {stats['f32'][1]}) "
          f"bf16=(blk {stats['bf16'][0]}, bit {stats['bf16'][1]}) "
          f"differing={differ}", flush=True)


def main():
    total = int(os.environ.get("BLOCKS", "65536"))
    n_bulk = int(os.environ.get("N", "4096"))
    spot = int(os.environ.get("SPOT", "4096"))
    run_pair(n_bulk, total, chunk_blocks=1024)
    if spot:
        run_pair(32768, spot, chunk_blocks=128)


if __name__ == "__main__":
    main()
