"""Profiling helpers: device traces, op annotations, and XLA cost analysis.

Parity with the reference's per-codec duration_ns counters
(/root/reference/include/polarcode/decoding/decoder.h:82 and the
Google-Benchmark counters in benchmark/main_benchmark.cpp:233-239), done
the TPU way: `jax.profiler` traces for timeline inspection and the
compiled executable's own cost analysis for FLOP/byte/roofline numbers
(the reference has no analogue of the latter — on TPU the compiler knows).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/polar_trace"):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto).

        with device_trace("/tmp/tr"):
            dec.decode(llr)[0].block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def cost_analysis(fn: Callable, *args) -> dict:
    """Compile fn(*args) and return XLA's own cost model numbers.

    Returns {"flops", "bytes_accessed", "transcendentals", ...} (keys as
    reported by the backend; empty dict if the backend reports none)."""
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        costs = compiled.cost_analysis()
    except Exception:
        return {}
    if costs is None:
        return {}
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    return dict(costs)


# Peak numbers for roofline/MFU context, per device platform. The axon
# tunnel exposes a single v5e-class chip; CPU rows get no peak (MFU=None).
_PEAKS = {
    # platform: (peak_f32_flops_per_s, hbm_bytes_per_s)
    "tpu": (4.9e13, 8.1e11),
    "axon": (4.9e13, 8.1e11),
}


def derive_roofline(flops: float, nbytes: float,
                    seconds: Optional[float] = None) -> dict:
    """Achieved/peak ratios from given FLOP/byte counts (any source)."""
    out = {"flops": flops, "bytes_accessed": nbytes}
    if nbytes > 0:
        out["arithmetic_intensity"] = flops / nbytes
    platform = jax.devices()[0].platform
    peak = _PEAKS.get(platform)
    if peak and nbytes > 0:
        ridge = peak[0] / peak[1]
        out["bound"] = (
            "compute" if out["arithmetic_intensity"] >= ridge else "memory"
        )
    if seconds and seconds > 0:
        out["achieved_flops_per_s"] = flops / seconds
        out["achieved_bytes_per_s"] = nbytes / seconds
        if peak:
            out["mfu"] = flops / seconds / peak[0]
            out["hbm_util"] = nbytes / seconds / peak[1]
            # When the achieved ratio is well under BOTH roofs the kernel
            # is limited by neither MXU issue rate nor HBM bandwidth —
            # it is bound by on-chip dataflow (VMEM traffic, VPU serial
            # chains, cross-lane shuffles). Reporting "memory" there (as
            # pure arithmetic-intensity classification would) mislabels
            # exactly the rows where further HBM optimization is useless.
            if out["mfu"] < 0.5 and out["hbm_util"] < 0.5:
                out["bound"] = "dataflow"
    return out


def roofline(fn: Callable, *args, seconds: Optional[float] = None,
             model=None, batch: Optional[int] = None) -> dict:
    """Cost analysis + achieved/peak ratios for one call of fn(*args).

    With `seconds` (a measured per-call time, e.g. from
    utils.timing.time_device_fn) adds achieved FLOP/s, bytes/s, MFU and
    HBM utilization plus the roofline verdict ("compute"/"memory" bound).

    `model` (a decoder/encoder instance) + `batch` enable the
    hand-derived fallback (utils/costmodel.py): XLA's cost analysis
    reports flops=0 for programs dominated by pallas_call, which made
    mfu/bound meaningless exactly on the production kernels. When the
    compiler's flop count is zero but a cost model exists for the
    model's class, the analytic counts are used and the result carries
    cost_model="analytic" (else "xla").
    """
    costs = cost_analysis(fn, *args)
    flops = float(costs.get("flops", 0.0) or 0.0)
    nbytes = float(costs.get("bytes accessed", 0.0) or 0.0)
    source = "xla"
    # XLA's cost analysis cannot see inside pallas_call: on pallas
    # backends it reports only the glue ops (a small, misleading count),
    # so the hand-derived model takes over whenever the model runs a
    # pallas fast path — not just when the count is exactly zero.
    pallas_model = getattr(model, "backend", None) == "pallas"
    fallback_reason = None
    if model is not None and batch and (flops <= 0.0 or pallas_model):
        try:
            analytic = analytic_costs(model, batch)
        except Exception as exc:  # formula bug: record, don't hide
            analytic = None
            fallback_reason = f"{type(exc).__name__}: {exc}"
        if analytic is not None:
            flops = analytic["flops"]
            nbytes = analytic["bytes_accessed"]
            source = "analytic"
    out = derive_roofline(flops, nbytes, seconds)
    out["cost_model"] = source
    if fallback_reason is not None:
        # A costmodel formula raised: the row falls back to the XLA
        # glue-only counts (misleading for pallas rows) — say so rather
        # than letting cost_model="xla" look intentional.
        out["cost_model_fallback_reason"] = fallback_reason
    return out


def analytic_costs(model, batch: int) -> Optional[dict]:
    """Dispatch to the hand-derived per-family count (utils/costmodel.py)
    by model class; None when no formula exists for the class.

    Formula errors propagate to the caller (roofline() records them as
    cost_model_fallback_reason) instead of being swallowed — a silent
    downgrade to XLA glue-only counts is the failure mode this module
    exists to fix."""
    from . import costmodel

    name = type(model).__name__
    if name == "SCLDecoder":
        return costmodel.scl_costs(model, batch)
    if name == "FastSSCDecoder":
        return costmodel.fastssc_costs(model, batch)
    if name == "PolarEncoder":
        return costmodel.encode_costs(model, batch)
    if name in ("ScanDecoder", "FastSScanDecoder"):
        return costmodel.scan_costs(model, batch)
    if name in ("LargeSCDecoder", "LargeSCLDecoder"):
        return costmodel.large_costs(model, batch)
    return None
