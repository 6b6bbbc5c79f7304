from .bits import (
    packbits,
    unpackbits,
    polar_generator_matrix,
    hard_decisions,
    bipolar_from_bits,
    bits_from_bipolar,
)

__all__ = [
    "packbits",
    "unpackbits",
    "polar_generator_matrix",
    "hard_decisions",
    "bipolar_from_bits",
    "bits_from_bipolar",
]
