"""Microbenchmark suite.

Capability parity with /root/reference/benchmark/main_benchmark.cpp:
encoder grids over N x CRC x systematic (:273-369) and decoder grids over
implementation x N x L x CRC (:371-503), reporting the same `CodeThr` /
`InfoThr` counters (coded / info bits per second, :233-239) plus
blocks-per-second. Results go to stdout and a JSON-lines file.

    python -m polar_codes_tpu.sim.benchmark --quick -o benchmarks.jsonl

Timing uses the chained-fori_loop device timer (utils/timing.py), so the
numbers are decode/encode wall time on the device, batch included.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def record(out, **kw):
    line = json.dumps(kw)
    print(line, flush=True)
    if out:
        out.write(line + "\n")
        out.flush()


def bits_budget_batch(n_len: int, budget_bits: int = 1 << 22) -> int:
    return max(64, budget_bits // n_len)


def main(argv=None):
    p = argparse.ArgumentParser(prog="polar-bench", description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="smaller grids (a few minutes)")
    p.add_argument("--filter", default="",
                   help="only run benchmarks whose name contains this")
    p.add_argument("-o", "--output", default="benchmarks.jsonl")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    p.add_argument("--batch-bits", type=int, default=1 << 22,
                   help="approximate coded bits per timed step")
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from ..construction import frozen_bits
    from ..models.encoder import PolarEncoder
    from ..models.fastssc import FastSSCDecoder
    from ..models.scl import SCLDecoder
    from ..models.scan import ScanDecoder
    from ..models.detectors import make_detector
    from ..utils.timing import time_device_fn

    rng = np.random.default_rng(0)
    out = open(args.output, "w") if args.output else None
    platform = jax.devices()[0].platform

    def llr_input(n_len, batch):
        return jax.device_put(
            jnp.asarray(rng.normal(0, 2, (batch, n_len)), jnp.float32)
        )

    def run_decoder(name, dec, n_len, k_len, c_bits, list_size):
        if args.filter and args.filter not in name:
            return
        batch = bits_budget_batch(n_len, args.batch_bits)
        llr = llr_input(n_len, batch)
        if getattr(dec, "dtype", jnp.float32) == jnp.int8:
            llr = jnp.clip(jnp.round(llr * 8), -127, 127).astype(jnp.int8)
        secs = time_device_fn(lambda x: dec.decode(x), llr, reps=8)
        record(
            out, bench=name, N=n_len, K=k_len, C=c_bits, L=list_size,
            batch=batch, platform=platform, seconds_per_batch=secs,
            code_thr_mbps=batch * n_len / secs / 1e6,
            info_thr_mbps=batch * k_len / secs / 1e6,
            blocks_per_s=batch / secs,
        )

    # ---- encoder grid (BM_polar_encode) -----------------------------------
    enc_ns = [256, 1024, 4096] if args.quick else [64, 256, 1024, 4096,
                                                   32768, 131072]
    for n_len in enc_ns:
        for c_bits in ([0, 32] if args.quick else [0, 8, 16, 32]):
            k_len = n_len // 2
            if c_bits >= k_len:
                continue
            name = f"encode_n{n_len}_crc{c_bits}"
            if args.filter and args.filter not in name:
                continue
            det = make_detector(c_bits, "crc")
            frozen = frozen_bits(n_len, k_len, 0.0)
            enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
            batch = bits_budget_batch(n_len, args.batch_bits)
            bits = jnp.asarray(
                rng.integers(0, 2, (batch, k_len)), jnp.uint8
            )
            secs = time_device_fn(lambda x: enc.encode(x), bits, reps=8)
            record(
                out, bench=name, N=n_len, K=k_len, C=c_bits, L=0,
                batch=batch, platform=platform, seconds_per_batch=secs,
                code_thr_mbps=batch * n_len / secs / 1e6,
                info_thr_mbps=batch * k_len / secs / 1e6,
                blocks_per_s=batch / secs,
            )

    # ---- Fast-SSC grid (BM_polar_decode L=1) ------------------------------
    dec_ns = [256, 1024] if args.quick else [64, 256, 1024, 4096, 8192]
    for n_len in dec_ns:
        k_len = n_len // 2
        frozen = frozen_bits(n_len, k_len, 0.0)
        for dtype, tag in ((jnp.float32, "float"), (jnp.int8, "char")):
            dec = FastSSCDecoder(n_len, frozen, systematic=True, dtype=dtype)
            run_decoder(f"fastssc_{tag}_n{n_len}", dec, n_len, k_len, 0, 1)

    # ---- SCL grid (BM_polar_decode L>1) -----------------------------------
    scl_ls = [2, 8] if args.quick else [2, 4, 8, 16, 32]
    for n_len in ([1024] if args.quick else [256, 1024, 4096]):
        k_len = n_len // 2
        det = make_detector(16, "crc")
        frozen = frozen_bits(n_len, k_len, 0.0)
        for list_size in scl_ls:
            for dtype, tag in ((jnp.float32, "float"), (jnp.int8, "char")):
                dec = SCLDecoder(n_len, frozen, list_size=list_size,
                                 systematic=True, detector=det, dtype=dtype)
                run_decoder(
                    f"cascl_{tag}_n{n_len}_l{list_size}", dec, n_len, k_len,
                    16, list_size,
                )

    # ---- SCAN -------------------------------------------------------------
    for n_len in ([1024] if args.quick else [256, 1024]):
        k_len = n_len // 2
        frozen = frozen_bits(n_len, k_len, 0.0)
        dec = ScanDecoder(n_len, frozen, systematic=True, iterations=4)
        run_decoder(f"scan4_n{n_len}", dec, n_len, k_len, 0, 4)

    if out:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
