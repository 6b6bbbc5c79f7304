"""Monte-Carlo BER/BLER simulation toolchain (pcsim equivalent).

Capability parity with /root/reference/src/simulation/: job configuration,
the construct->encode->modulate->AWGN->demodulate->decode->count chain,
per-job timing statistics, and CSV results with pcsim's 23-column schema.
"""

from .montecarlo import MonteCarlo, JobResult, Statistics, write_csv

__all__ = ["MonteCarlo", "JobResult", "Statistics", "write_csv"]
