"""polar_codes_tpu — a TPU-native polar-code FEC framework.

Brand-new JAX/XLA/Pallas implementation with the full capabilities of the
C++ reference library ant-uni-bremen/polar-codes: code construction,
systematic/non-systematic encoding, SC/Fast-SSC/SCL/adaptive/SCAN/SCFlip
decoding, CRC/CMAC error detection, puncturing, BPSK/ASK modems with
AWGN/Rayleigh channels, and a mesh-sharded Monte-Carlo BER/BLER simulator.

Design inversion vs the reference: the reference vectorizes ONE codeword
across AVX2 lanes and parallelizes with host threads; this framework batches
thousands of codewords per device (batch axis -> VPU lanes / MXU tiles),
specializes the decoder tree at trace time instead of C++ construction time,
and shards the Monte-Carlo batch across a TPU mesh with psum-aggregated
statistics.
"""

__version__ = "0.1.0"

from . import construction
from . import ops
from . import utils

__all__ = ["construction", "ops", "utils", "__version__"]
