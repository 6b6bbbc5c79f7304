"""Error-locator simulation app: first-error-position histograms.

Capability parity with /root/reference/src/errorlocator/ (main, setup,
simulator, statistics): runs the encode->AWGN->genie-SC chain and writes a
CSV histogram of first-error u-channel positions plus per-channel error
counts — the empirical bit-channel reliability measurement that feeds
SCFlip node ranking.

    python -m polar_codes_tpu.sim.errorlocator_app -n 256 -r 0.5 \
        --snr-min 1 --snr-max 3 --snr-count 3 -w 1000000 -o errorlocator
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="errorlocator-tpu", description=__doc__)
    p.add_argument("-n", "--blocklength", type=int, default=1024)
    p.add_argument("-r", "--rate", type=float, default=0.5)
    p.add_argument("-d", "--design-snr", type=float, default=0.0)
    p.add_argument("--construction", default="BB")
    p.add_argument("--snr-min", type=float, default=0.0)
    p.add_argument("--snr-max", type=float, default=4.0)
    p.add_argument("--snr-count", type=int, default=5)
    p.add_argument("-w", "--workload", type=float, default=1e7)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("-o", "--output", default="errorlocator")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from ..construction import frozen_bits
    from ..models.encoder import PolarEncoder
    from ..models.errorlocator import ErrorLocator
    from ..dsp import bpsk_modulate, add_awgn

    n_len = args.blocklength
    k_len = int(n_len * args.rate)
    frozen = frozen_bits(n_len, k_len, args.design_snr, args.construction)
    enc = PolarEncoder(n_len, frozen, systematic=False)
    loc = ErrorLocator(n_len, frozen)
    blocks = max(1, int(args.workload // n_len))
    chunks = max(1, blocks // args.batch)

    def step(key, esn0):
        k1, k2 = jax.random.split(key)
        info = jax.random.bernoulli(k1, 0.5, (args.batch, k_len)).astype(
            jnp.uint8
        )
        code = enc.encode(info)
        llr = add_awgn(k2, bpsk_modulate(code), esn0_linear=esn0)
        first, err = loc.locate(llr, code)
        first_hist = jnp.sum(
            jax.nn.one_hot(first, n_len + 1, dtype=jnp.int32), axis=0
        )
        err_counts = jnp.sum(err.astype(jnp.int32), axis=0)
        return first_hist, err_counts

    step_j = jax.jit(step)
    snrs = (
        np.linspace(args.snr_min, args.snr_max, args.snr_count)
        if args.snr_count > 1
        else [args.snr_max]
    )
    rows = []
    for s_i, snr in enumerate(snrs):
        esn0 = jnp.float32(10 ** (snr / 10) * k_len / n_len)
        first_hist = np.zeros(n_len + 1, dtype=np.int64)
        err_counts = np.zeros(n_len, dtype=np.int64)
        for i in range(chunks):
            f, e = step_j(jax.random.PRNGKey(1000 * s_i + i), esn0)
            first_hist += np.asarray(f)
            err_counts += np.asarray(e)
        total = chunks * args.batch
        print(
            f"EbN0={snr:.2f}: {total - first_hist[n_len]}/{total} frames "
            f"with >=1 genie error"
        )
        for pos in range(n_len):
            if first_hist[pos] or err_counts[pos]:
                rows.append(
                    (n_len, k_len, snr, pos, first_hist[pos], err_counts[pos],
                     total)
                )

    out = f"{args.output}_firsterror.csv"
    with open(out, "w") as f:
        f.write('"N","K","Eb/N0","position","first_errors","errors","frames"\n')
        for row in rows:
            f.write(",".join(str(v) for v in row) + "\n")
    print(f"results written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
