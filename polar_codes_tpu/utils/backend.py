"""Backend auto-selection: hand out the qualified fast path by default.

The reference's factory hands out its fastest implementation by default
(/root/reference/src/polarcode/decoding/decoder.cpp:54-87 picks the AVX
special-case decoder for every shape it covers); the drop-in analogue here
is that constructors accept backend=None and resolve it to "pallas" when
(a) the process is on a TPU-class platform (Mosaic compiles; the CPU test
mesh always runs the XLA path) and (b) the shape is inside the envelope
qualified by the HW benchmark grid and paired BLER A/Bs (BENCH_TPU_r*
rows; VALIDATION.md). An explicit "xla"/"pallas" always wins.
"""

from __future__ import annotations

import functools

_TPU_PLATFORMS = ("tpu", "axon")


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    """True when the default JAX platform is a TPU-class device."""
    try:
        import jax

        return jax.devices()[0].platform in _TPU_PLATFORMS
    except Exception:
        return False


def resolve_backend(requested, family: str, block_length: int,
                    list_size: int = 1) -> str:
    """Resolve a constructor's backend argument.

    requested: None (auto) or an explicit "xla"/"pallas" (passed through).
    family: "encode" | "fastssc" | "scl" | "scan" | "large".

    Envelopes follow the measured grid: encode_pallas beats xla from
    N=256 up (and the MXU factored path carries N>2048 to 131072);
    fastssc_pallas wins at 1024<=N<=8192 (xla wins below); cascl_pallas
    wins at 256<=N<=8192 for 2<=L<=32; the large-N scan chunk kernel wins
    at every measured shape; scan4_pallas is a wash, so scan stays xla.
    """
    if requested is not None:
        return requested
    if not on_tpu():
        return "xla"
    n = block_length
    if family == "encode":
        return "pallas" if n >= 256 else "xla"
    if family == "fastssc":
        return "pallas" if 1024 <= n <= 8192 else "xla"
    if family == "scl":
        return (
            "pallas" if 256 <= n <= 8192 and 2 <= list_size <= 32
            else "xla"
        )
    if family == "large":
        return "pallas"
    return "xla"
