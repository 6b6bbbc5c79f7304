"""Paired adaptive-vs-direct-SCL BLER A/B on SHARED noise.

Settles the r3 open question (VERDICT weak #7): the adaptive decoder's
measured operating-point BLER (3.2e-3 @2 dB) vs direct pallas SCL-8
(2.82e-3) — Monte-Carlo noise from disjoint sample sets, or a real
difference? Here both arms decode the SAME noisy blocks, so any
difference is an actual decision difference: a block where the Fast-SSC
pass produced a wrong payload whose CRC nevertheless passed (adaptive
stops there; direct SCL searches the list), or a CRC-failing block where
the bucket rerun (bit-identical to direct SCL by test) was skipped by
the bucket-cap policy.

Usage: [BLOCKS=65536] python profiling/adaptive_ab.py
Prints per-arm BLER, the disagreement count, and its breakdown.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.encoder import PolarEncoder
    from polar_codes_tpu.models.scl import SCLDecoder
    from polar_codes_tpu.models.adaptive import AdaptiveDecoder
    from polar_codes_tpu.models.detectors import CRC16
    from polar_codes_tpu.dsp import bpsk_modulate, add_awgn

    n_len, k_len, n_list = 1024, 512, 8
    ebn0_db = 2.0
    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    det = CRC16()
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    scl = SCLDecoder(n_len, frozen, list_size=n_list, systematic=True,
                     detector=det, backend="pallas")
    ada = AdaptiveDecoder(n_len, frozen, list_size=n_list, systematic=True,
                          detector=det)

    total = int(os.environ.get("BLOCKS", "65536"))
    chunk = 2048
    esn0 = 10.0 ** (ebn0_db / 10.0) * k_len / n_len
    payload_len = k_len - det.tail_bits
    stats = {"scl": 0, "ada": 0}
    n_disagree = 0
    n_ada_wrong_scl_right = 0
    n_scl_wrong_ada_right = 0
    rng = np.random.default_rng(321)
    for c in range(total // chunk):
        info = rng.integers(0, 2, (chunk, k_len)).astype(np.uint8)
        code = enc.encode(jnp.asarray(info))
        llr = add_awgn(jax.random.PRNGKey(5000 + c), bpsk_modulate(code),
                       esn0_linear=esn0)
        llr = jax.device_put(np.asarray(llr))
        payload = info[:, :payload_len]
        got_s = np.asarray(scl.decode(llr)[0])[:, :payload_len]
        got_a = np.asarray(ada.decode(llr)[0])[:, :payload_len]
        err_s = (got_s != payload).any(axis=-1)
        err_a = (got_a != payload).any(axis=-1)
        stats["scl"] += int(err_s.sum())
        stats["ada"] += int(err_a.sum())
        dis = (got_s != got_a).any(axis=-1)
        n_disagree += int(dis.sum())
        n_ada_wrong_scl_right += int((dis & err_a & ~err_s).sum())
        n_scl_wrong_ada_right += int((dis & err_s & ~err_a).sum())
        if (c + 1) % 8 == 0:
            done = (c + 1) * chunk
            print(f"{done} blocks: scl BLER {stats['scl']/done:.3e} "
                  f"({stats['scl']}) | ada BLER {stats['ada']/done:.3e} "
                  f"({stats['ada']}) | disagree {n_disagree}", flush=True)
    print("FINAL", dict(
        blocks=total,
        scl_bler=stats["scl"] / total,
        ada_bler=stats["ada"] / total,
        disagree=n_disagree,
        ada_wrong_scl_right=n_ada_wrong_scl_right,
        scl_wrong_ada_right=n_scl_wrong_ada_right,
    ), flush=True)


if __name__ == "__main__":
    main()
