"""Bisect which bf16 construct crashes Mosaic on real HW.

The [L, span, B] SCL kernels compile and run in f32 but the bf16-state
variant dies in the TPU compile helper (SIGABRT, no diagnostics — same
signature as the r2 grid's cascl_pallas_char row). Each probe below
compiles ONE construct from the kernel in bf16 and reports ok/fail, so
the crash can be pinned and worked around.

Usage: python profiling/bf16_probe.py [probe ...]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import functools
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W, S, B = 8, 256, 128
    bf = jnp.bfloat16

    def run(name, kernel, out_shape, *args):
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            r = jax.block_until_ready(jax.jit(fn)(*args))
            print(f"{name}: ok {np.asarray(r).ravel()[:2]}", flush=True)
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).split("\n")[0][:140]
            print(f"{name}: FAIL {type(exc).__name__}: {msg}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, (W, S, B)), bf)
    y = jnp.asarray(rng.normal(0, 2, (W, S, B)), bf)
    src = jnp.asarray(rng.integers(0, W, (W, B)), jnp.int32)

    def k_fg(x_ref, y_ref, o_ref):
        a, b = x_ref[...], y_ref[...]
        sign = jnp.sign(a) * jnp.sign(b)
        f = sign * jnp.minimum(jnp.abs(a), jnp.abs(b))
        o_ref[...] = b + f * a

    def k_select(x_ref, s_ref, o_ref):
        xv, sv = x_ref[...], s_ref[...]
        out = jnp.broadcast_to(xv[0:1], xv.shape)
        for k in range(1, W):
            out = jnp.where((sv == k)[:, None, :], xv[k : k + 1], out)
        o_ref[...] = out

    def k_rep0(x_ref, o_ref):
        xv = x_ref[...]
        half = xv[: W // 2]
        o_ref[...] = jnp.concatenate(
            [half[k : k + 1] for k in range(W // 2) for _ in range(2)], 0
        )

    def k_narrow(x_ref, o_ref):
        # deep-span slicing: bf16 sub-tile span slices 256->..->2
        v = x_ref[...]
        while v.shape[1] > 2:
            h = v.shape[1] // 2
            a, b = v[:, :h, :], v[:, h:, :]
            sign = jnp.sign(a) * jnp.sign(b)
            v = sign * jnp.minimum(jnp.abs(a), jnp.abs(b))
        o_ref[...] = v

    def k_leaf_f32(x_ref, o_ref):
        # f32 leaf on bf16 state: upcast, hard-decision, downcast
        v = x_ref[...].astype(jnp.float32)
        hard = jnp.where(jnp.signbit(v), -1.0, 1.0).astype(jnp.float32)
        o_ref[...] = hard.astype(bf)

    def k_metric(x_ref, o_ref):
        v = x_ref[...]
        o_ref[...] = jnp.sum(
            jnp.minimum(v, 0.0).astype(jnp.float32), axis=1
        )

    def k_transpose(x_ref, o_ref):
        # metrics.T pattern on f32 is fine; probe the bf16 2-D transpose
        o_ref[...] = x_ref[...].T


    def k_sign(x_ref, y_ref, o_ref):
        o_ref[...] = jnp.sign(x_ref[...]) * jnp.sign(y_ref[...])

    def k_minabs(x_ref, y_ref, o_ref):
        o_ref[...] = jnp.minimum(jnp.abs(x_ref[...]), jnp.abs(y_ref[...]))

    def k_fg_f32(x_ref, y_ref, o_ref):
        # bf16 storage, f32 ALU: upcast -> min-sum f + g -> downcast
        a = x_ref[...].astype(jnp.float32)
        b = y_ref[...].astype(jnp.float32)
        sign = jnp.sign(a) * jnp.sign(b)
        f = sign * jnp.minimum(jnp.abs(a), jnp.abs(b))
        o_ref[...] = (b + f * a).astype(bf)

    def k_fg_where(x_ref, y_ref, o_ref):
        # sign-free bf16 formulation: compare-xor + negate
        a, b = x_ref[...], y_ref[...]
        m = jnp.minimum(jnp.abs(a), jnp.abs(b))
        neg = (a < 0) != (b < 0)
        f = jnp.where(neg, -m, m)
        o_ref[...] = b + f * a

    def k_narrow_f32(x_ref, o_ref):
        # bf16 storage at narrowing spans, f32 ALU (the workaround shape)
        v = x_ref[...]
        while v.shape[1] > 2:
            h = v.shape[1] // 2
            a = v[:, :h, :].astype(jnp.float32)
            b = v[:, h:, :].astype(jnp.float32)
            sign = jnp.sign(a) * jnp.sign(b)
            v = (sign * jnp.minimum(jnp.abs(a), jnp.abs(b))).astype(bf)
        o_ref[...] = v

    def k_combine_narrow(x_ref, o_ref):
        # bf16 sublane-dim concats at sub-tile spans (the combine path)
        v = x_ref[...][:, :2, :]  # [W, 2, B]
        while v.shape[1] < S:
            h = v.shape[1] // 2
            left, right = v[:, :h, :], v[:, h:, :]
            v = jnp.concatenate([left * right, right, v], axis=1)
        o_ref[...] = v[:, :S, :]

    def k_g_bf16(x_ref, y_ref, o_ref):
        # g alone has no sign(): pure bf16 mul/add
        a, b = x_ref[...], y_ref[...]
        u = jnp.where((a * b) > 0, 1.0, -1.0).astype(bf)
        o_ref[...] = b + u * a

    def k_fg_bitcast(x_ref, y_ref, o_ref):
        # f via int16 bitcast: sign-xor + magnitude-min on the raw bits
        # (IEEE magnitudes compare monotonically as unsigned ints)
        a, b = x_ref[...], y_ref[...]
        ai = jax.lax.bitcast_convert_type(a, jnp.int16)
        bi = jax.lax.bitcast_convert_type(b, jnp.int16)
        s = (ai ^ bi) & jnp.int16(-32768)
        m = jnp.minimum(ai & jnp.int16(0x7FFF), bi & jnp.int16(0x7FFF))
        f = jax.lax.bitcast_convert_type(s | m, bf)
        o_ref[...] = b + f * a

    def k_fg_bitcast32(x_ref, y_ref, o_ref):
        # f32 f via int32 bitcast (the reference's own AVX formulation,
        # avx_float.h:55: sign-XOR + magnitude-min on raw bits) — saves
        # the two jnp.sign chains if Mosaic takes i32 vector logicals
        a = x_ref[...].astype(jnp.float32)
        b = y_ref[...].astype(jnp.float32)
        ai = jax.lax.bitcast_convert_type(a, jnp.int32)
        bi = jax.lax.bitcast_convert_type(b, jnp.int32)
        s = (ai ^ bi) & jnp.int32(-2147483648)
        m = jnp.minimum(ai & jnp.int32(0x7FFFFFFF), bi & jnp.int32(0x7FFFFFFF))
        f = jax.lax.bitcast_convert_type(s | m, jnp.float32)
        o_ref[...] = (b + f * a).astype(bf)

    xu8 = jnp.asarray(rng.integers(0, 2, (W, S, B)), jnp.uint8)

    def k_select_u8(x_ref, s_ref, o_ref):
        # u8 bits state: select chain at 1/4 the f32 vreg traffic
        xv, sv = x_ref[...], s_ref[...]
        out = jnp.broadcast_to(xv[0:1], xv.shape)
        for k in range(1, W):
            out = jnp.where((sv == k)[:, None, :], xv[k : k + 1], out)
        o_ref[...] = out

    def k_xor_u8_narrow(x_ref, o_ref):
        # combine as u8 XOR with narrow-span slicing/concat
        v = x_ref[...][:, :2, :]
        while v.shape[1] < S:
            h = v.shape[1] // 2
            left, right = v[:, :h, :], v[:, h:, :]
            v = jnp.concatenate([left ^ right, right, v], axis=1)
        o_ref[...] = v[:, :S, :]

    def k_u8_to_bipolar(x_ref, y_ref, o_ref):
        # g from u8 bits: convert to ±1 f32 then fma
        bits = x_ref[...]
        a = y_ref[...].astype(jnp.float32)
        u = 1.0 - 2.0 * bits.astype(jnp.float32)
        o_ref[...] = a + u * a

    def k_g_mask_u8(x_ref, y_ref, o_ref):
        # g via select on a u8-compare mask over f32 operands (risky:
        # i1 relayout between (32,128) u8 and (8,128) f32 tilings)
        bits = x_ref[...]
        a = y_ref[...].astype(jnp.float32)
        o_ref[...] = jnp.where(bits == 1, a + a, a - a)

    xi8 = jnp.asarray(
        1 - 2 * rng.integers(0, 2, (W, S, B)), jnp.int8
    )  # bipolar ±1 int8 bits

    def k_i8_roundtrip(x_ref, y_ref, o_ref):
        # bits as ±1 int8: cast to f32 for g, f32 hard back to int8
        u = x_ref[...].astype(jnp.float32)
        a = y_ref[...].astype(jnp.float32)
        g = a + u * a
        hard = jnp.where(jnp.signbit(g), -1, 1).astype(jnp.int8)
        o_ref[...] = hard

    def k_i8_combine_narrow(x_ref, o_ref):
        # combine = ±1 product in int8, narrow-span slicing/concat
        v = x_ref[...][:, :2, :]
        while v.shape[1] < S:
            h = v.shape[1] // 2
            left, right = v[:, :h, :], v[:, h:, :]
            v = jnp.concatenate([left * right, right, v], axis=1)
        o_ref[...] = v[:, :S, :]

    def k_select_i8(x_ref, s_ref, o_ref):
        xv, sv = x_ref[...], s_ref[...]
        out = jnp.broadcast_to(xv[0:1], xv.shape)
        for k in range(1, W):
            out = jnp.where((sv == k)[:, None, :], xv[k : k + 1], out)
        o_ref[...] = out

    xi01 = jnp.asarray(rng.integers(0, 2, (W, S, B)), jnp.int8)

    def k_i8_xor_narrow(x_ref, o_ref):
        # bits as {0,1} int8: combine = XOR, narrow-span slicing/concat
        v = x_ref[...][:, :2, :]
        while v.shape[1] < S:
            h = v.shape[1] // 2
            left, right = v[:, :h, :], v[:, h:, :]
            v = jnp.concatenate([left ^ right, right, v], axis=1)
        o_ref[...] = v[:, :S, :]

    def k_i8_g(x_ref, y_ref, o_ref):
        # g from {0,1} int8 bits: u = 1-2b in f32, then fma + hard back
        bits = x_ref[...]
        a = y_ref[...].astype(jnp.float32)
        u = 1.0 - 2.0 * bits.astype(jnp.float32)
        g = a + u * a
        o_ref[...] = jnp.where(jnp.signbit(g), 1, 0).astype(jnp.int8)

    probes = {
        "i8_xor_narrow": lambda: run(
            "i8_xor_narrow", k_i8_xor_narrow,
            jax.ShapeDtypeStruct((W, S, B), jnp.int8), xi01),
        "i8_g": lambda: run(
            "i8_g", k_i8_g,
            jax.ShapeDtypeStruct((W, S, B), jnp.int8), xi01, x),
        "i8_roundtrip": lambda: run(
            "i8_roundtrip", k_i8_roundtrip,
            jax.ShapeDtypeStruct((W, S, B), jnp.int8), xi8, x),
        "i8_combine_narrow": lambda: run(
            "i8_combine_narrow", k_i8_combine_narrow,
            jax.ShapeDtypeStruct((W, S, B), jnp.int8), xi8),
        "select_i8": lambda: run(
            "select_i8", k_select_i8,
            jax.ShapeDtypeStruct((W, S, B), jnp.int8), xi8, src),
        "select_u8": lambda: run(
            "select_u8", k_select_u8,
            jax.ShapeDtypeStruct((W, S, B), jnp.uint8), xu8, src),
        "xor_u8_narrow": lambda: run(
            "xor_u8_narrow", k_xor_u8_narrow,
            jax.ShapeDtypeStruct((W, S, B), jnp.uint8), xu8),
        "u8_to_bipolar": lambda: run(
            "u8_to_bipolar", k_u8_to_bipolar,
            jax.ShapeDtypeStruct((W, S, B), jnp.float32), xu8, x),
        "g_mask_u8": lambda: run(
            "g_mask_u8", k_g_mask_u8,
            jax.ShapeDtypeStruct((W, S, B), jnp.float32), xu8, x),
        "fg": lambda: run("fg", k_fg,
                          jax.ShapeDtypeStruct((W, S, B), bf), x, y),
        "fg_bitcast32": lambda: run("fg_bitcast32", k_fg_bitcast32,
                                    jax.ShapeDtypeStruct((W, S, B), bf),
                                    x, y),
        "select": lambda: run("select", k_select,
                              jax.ShapeDtypeStruct((W, S, B), bf), x, src),
        "rep0": lambda: run("rep0", k_rep0,
                            jax.ShapeDtypeStruct((W, S, B), bf), x),
        "narrow": lambda: run("narrow", k_narrow,
                              jax.ShapeDtypeStruct((W, 2, B), bf), x),
        "leaf_f32": lambda: run("leaf_f32", k_leaf_f32,
                                jax.ShapeDtypeStruct((W, S, B), bf), x),
        "metric": lambda: run("metric", k_metric,
                              jax.ShapeDtypeStruct((W, B), jnp.float32), x),
        "transpose": lambda: run(
            "transpose", k_transpose,
            jax.ShapeDtypeStruct((B, W), bf),
            jnp.asarray(rng.normal(0, 1, (W, B)), bf)),
        "sign": lambda: run("sign", k_sign,
                            jax.ShapeDtypeStruct((W, S, B), bf), x, y),
        "minabs": lambda: run("minabs", k_minabs,
                              jax.ShapeDtypeStruct((W, S, B), bf), x, y),
        "fg_f32": lambda: run("fg_f32", k_fg_f32,
                              jax.ShapeDtypeStruct((W, S, B), bf), x, y),
        "fg_where": lambda: run("fg_where", k_fg_where,
                                jax.ShapeDtypeStruct((W, S, B), bf), x, y),
        "narrow_f32": lambda: run("narrow_f32", k_narrow_f32,
                                  jax.ShapeDtypeStruct((W, 2, B), bf), x),
        "combine_narrow": lambda: run(
            "combine_narrow", k_combine_narrow,
            jax.ShapeDtypeStruct((W, S, B), bf), x),
        "g_bf16": lambda: run("g_bf16", k_g_bf16,
                              jax.ShapeDtypeStruct((W, S, B), bf), x, y),
        "fg_bitcast": lambda: run("fg_bitcast", k_fg_bitcast,
                                  jax.ShapeDtypeStruct((W, S, B), bf), x, y),
    }
    names = sys.argv[1:] or list(probes)
    for n in names:
        probes[n]()


if __name__ == "__main__":
    main()
