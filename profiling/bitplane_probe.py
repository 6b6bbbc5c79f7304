"""Mosaic microprobe: can the SCL kernel's bit state live as i32 bitplanes
packed along the path axis?

The fork gather over packed words needs a per-lane VARIABLE shift
(out_l = (packed >> src[l, b]) & 1 with src a [B] vector) — the one
pattern NEXT.md flagged as the Mosaic risk. This probes, in isolation:

  pack      sum_l (bit01_l << l)          (constant shifts + or)
  varshift  (packed >> src) & 1           (vector >> vector)
  fork      full gather: w var-shifts + repack
  xor       packed combine (left XOR right)

and times an A/B of the fork against the select-chain formulation.

Usage: python profiling/bitplane_probe.py [cpu]
"""
import os as _os, sys as _sys, time
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    interpret = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from polar_codes_tpu.utils.timing import time_device_fn

    W, S, B = 8, 512, 128
    rng = np.random.default_rng(0)
    bits01 = jnp.asarray(rng.integers(0, 2, (W, S, B)), jnp.int32)
    src = jnp.asarray(rng.integers(0, W, (W, B)), jnp.int32)

    def call(kernel, outs, *ins):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(outs),
            out_shape=[jax.ShapeDtypeStruct(s, d) for s, d in outs],
            interpret=interpret,
        )(*ins)

    def pack(b01):
        w = b01.shape[0]
        acc = b01[0]
        for k in range(1, w):
            acc = acc | (b01[k] << k)
        return acc  # [S, B] i32

    # 1) pack + xor (constant shifts only)
    def k_pack(b_ref, o_ref):
        o_ref[...] = pack(b_ref[...])

    try:
        packed, = call(k_pack, [((S, B), jnp.int32)], bits01)
        print("pack: OK", flush=True)
    except Exception as exc:
        print(f"pack: FAIL {type(exc).__name__} {str(exc)[:200]}", flush=True)
        return

    # 2) variable shift: vector >> vector
    def k_var(p_ref, s_ref, o_ref):
        p = p_ref[...]  # [S, B]
        sh = s_ref[...]  # [W, B]
        outs = [(p >> sh[k][None, :]) & 1 for k in range(W)]
        o_ref[...] = jnp.stack(outs, axis=0)

    try:
        got, = call(k_var, [((W, S, B), jnp.int32)], packed, src)
        ref = np.stack([
            (np.asarray(packed) >> np.asarray(src)[k][None, :]) & 1
            for k in range(W)
        ])
        ok = np.array_equal(np.asarray(got), ref)
        print(f"varshift: OK match={ok}", flush=True)
    except Exception as exc:
        print(f"varshift: FAIL {type(exc).__name__} {str(exc)[:200]}",
              flush=True)
        return

    # 3) full fork (var-shift gather + repack) vs select chain, timed
    def k_fork_bp(p_ref, s_ref, o_ref):
        p = p_ref[...]
        sh = s_ref[...]
        acc = (p >> sh[0][None, :]) & 1
        for k in range(1, W):
            acc = acc | (((p >> sh[k][None, :]) & 1) << k)
        o_ref[...] = acc

    def k_fork_sel(b_ref, s_ref, o_ref):
        x = b_ref[...]  # [W, S, B]
        srcv = s_ref[...]
        out = jnp.broadcast_to(x[0:1], x.shape)
        for k in range(1, W):
            out = jnp.where((srcv == k)[:, None, :], x[k:k + 1], out)
        o_ref[...] = out

    for _ in range(1):
        t0 = time.perf_counter()
        fbp = jax.jit(lambda p, s: call(
            k_fork_bp, [((S, B), jnp.int32)], p, s)[0])
        out_bp = fbp(packed, src)
        jax.block_until_ready(out_bp)
        fsel = jax.jit(lambda b, s: call(
            k_fork_sel, [((W, S, B), jnp.int32)], b, s)[0])
        out_sel = fsel(bits01, src)
        jax.block_until_ready(out_sel)
        # value check: unpack bp result
        up = np.stack([(np.asarray(out_bp) >> k) & 1 for k in range(W)])
        print(f"fork: values match={np.array_equal(up, np.asarray(out_sel))}"
              f" (setup {time.perf_counter()-t0:.1f}s)", flush=True)
        if interpret:
            return
        # repeat the body 16x inside one kernel for timing resolution
        REPS = 16

        def k_bp_n(p_ref, s_ref, o_ref):
            p = p_ref[...]
            sh = s_ref[...]
            for r in range(REPS):
                acc = (p >> sh[0][None, :]) & 1
                for k in range(1, W):
                    acc = acc | (((p >> sh[k][None, :]) & 1) << k)
                p = acc
            o_ref[...] = p

        def k_sel_n(b_ref, s_ref, o_ref):
            x = b_ref[...]
            srcv = s_ref[...]
            for r in range(REPS):
                out = jnp.broadcast_to(x[0:1], x.shape)
                for k in range(1, W):
                    out = jnp.where((srcv == k)[:, None, :],
                                    x[k:k + 1], out)
                x = out
            o_ref[...] = x

        fbpn = jax.jit(lambda p, s: call(
            k_bp_n, [((S, B), jnp.int32)], p, s)[0])
        fseln = jax.jit(lambda b, s: call(
            k_sel_n, [((W, S, B), jnp.int32)], b, s)[0])
        dt_bp = time_device_fn(lambda p: fbpn(p, src), packed, reps=50)
        dt_sel = time_device_fn(lambda b: fseln(b, src), bits01, reps=50)
        print(f"fork x{REPS}: bitplane {dt_bp*1e6:.1f} us, "
              f"selects {dt_sel*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
