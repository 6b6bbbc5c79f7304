"""Ablate the Pallas SCL kernel's cost centers at the flagship shape.

Each arm monkeypatches ONE mechanism out of ops/scl_kernel_bl.py and
re-times the full decode, so the deltas localize where the ~0.38 ms of
in-kernel time goes (results feed PERF.md "where the next factor comes
from"):

  full       unmodified decode (reference point)
  nogather   path-fork select chains skipped (_take_state/_take_vec
             identity) — WRONG RESULTS; times the kernel without the
             [w, S, B] gather cascades
  noextract  prune keeps the candidate-delta math but replaces the
             L-round iterative max extraction with static picks —
             WRONG RESULTS; isolates the extraction chains
  noweak     leaf_rate1/SPC weakest-LLR extraction replaced by static
             indices — WRONG RESULTS; isolates the _weakest chains
  nocrc      decode_paths only (no CRC-aided selection)

Usage: [B=1024] python profiling/ablate.py [arm ...]
"""
import os
import sys
import contextlib
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@contextlib.contextmanager
def patched(arm):
    import jax.numpy as jnp
    import polar_codes_tpu.ops.scl_kernel_bl as kbl

    saved = {}

    def save(name, value):
        saved[name] = getattr(kbl, name)
        setattr(kbl, name, value)

    if arm == "nogather":
        # widening must still change shapes (w_in -> w_out); only the
        # runtime [w, B]-indexed select chains are replaced by static
        # cyclic tiles (concat + slice: no selects)
        rep0 = kbl._rep0

        def tile_to(x, w_out):
            w_in = x.shape[0]
            if w_in == w_out:
                return x
            reps = -(-w_out // w_in)
            return jnp.concatenate([x] * reps, axis=0)[:w_out]

        save("_take_state",
             lambda x, src: rep0(x, src[1]) if isinstance(src, tuple)
             else tile_to(x, src.shape[0]))
        save("_take_vec",
             lambda v, src: rep0(v, src[1]) if isinstance(src, tuple)
             else tile_to(v, src.shape[0]))
    elif arm == "noextract":
        orig_iota = kbl._iota

        def prune_static(self, metrics, deltas):
            n_list, n_cand = self.n_list, deltas.shape[0]
            width = metrics.shape[0]
            cand = metrics[None, :, :] + deltas  # keep the delta math
            if width * n_cand <= n_list:
                new_metrics = jnp.concatenate(
                    [cand[c: c + 1, l] for l in range(width)
                     for c in range(n_cand)], axis=0)
                cand_id = orig_iota(new_metrics.shape, 0) % n_cand
                return new_metrics, ("rep", n_cand), cand_id
            # static picks: first L flat candidates, in order
            flat = [cand[i % n_cand, i // n_cand] for i in range(n_list)]
            new_metrics = jnp.stack(flat, axis=0)
            idx = orig_iota(new_metrics.shape, 0)
            return new_metrics, idx // n_cand, idx % n_cand

        save("_BlEmitter", type("P", (kbl._BlEmitter,),
                                {"_prune": prune_static}))
    elif arm == "noweak":
        def weakest_static(mag, count):
            ms = [jnp.min(mag, axis=1).astype(jnp.float32)] * count
            is_ = [orig_iota2(mag.shape[:1] + mag.shape[2:], 0) * 0 + j
                   for j in range(count)]
            return ms, is_

        orig_iota2 = kbl._iota
        save("_BlEmitter", type("P", (kbl._BlEmitter,),
                                {"_weakest": staticmethod(weakest_static)}))
    try:
        yield
    finally:
        for name, value in saved.items():
            setattr(kbl, name, value)


def run(arm):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from polar_codes_tpu.construction import frozen_bits
    from polar_codes_tpu.models.encoder import PolarEncoder
    from polar_codes_tpu.models.scl import SCLDecoder
    from polar_codes_tpu.models.detectors import CRC16
    from polar_codes_tpu.dsp import bpsk_modulate, add_awgn
    from polar_codes_tpu.utils.timing import time_device_fn

    n_len, k_len = 1024, 512
    L = int(os.environ.get("L", "8"))
    frozen = frozen_bits(n_len, k_len, 0.0, "BB")
    det = CRC16()
    enc = PolarEncoder(n_len, frozen, systematic=True, detector=det)
    batch = int(os.environ.get("B", "1024"))
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (batch, k_len)).astype(np.uint8)
    code = enc.encode(jnp.asarray(info))
    esn0 = 10.0 ** 0.2 * k_len / n_len
    llr = jax.device_put(np.asarray(add_awgn(
        jax.random.PRNGKey(1), bpsk_modulate(code), esn0_linear=esn0)))

    with patched(arm):
        dec = SCLDecoder(n_len, frozen, list_size=L, systematic=True,
                         detector=det, backend="pallas")
        if arm == "nocrc":
            fn = dec._build_pallas()
            dt = time_device_fn(lambda x: fn.raw_bits(x)[1], llr)
        else:
            dt = time_device_fn(lambda x: dec.decode(x)[1], llr)
    mbps = batch * (k_len - det.tail_bits) / dt / 1e6
    print(f"{arm:10s}: {dt*1e3:.3f} ms  {mbps:.0f} Mbit/s", flush=True)
    return dt


def main():
    arms = sys.argv[1:] or ["full", "nocrc", "nogather", "noextract",
                            "noweak"]
    for arm in arms:
        try:
            run(arm)
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"{arm:10s}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)


if __name__ == "__main__":
    main()
