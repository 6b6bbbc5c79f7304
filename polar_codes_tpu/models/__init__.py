from .detectors import (
    Detector,
    Dummy,
    CRC8,
    CRC16,
    CRC32,
    CRC6NR,
    CRC11NR,
    CRC16NR,
    CRC24NRC,
    CMAC,
    make_detector,
)
from .encoder import PolarEncoder
from .fastssc import FastSSCDecoder
from .scl import SCLDecoder

__all__ = [
    "Detector",
    "Dummy",
    "CRC8",
    "CRC16",
    "CRC32",
    "CRC6NR",
    "CRC11NR",
    "CRC16NR",
    "CRC24NRC",
    "CMAC",
    "make_detector",
    "PolarEncoder",
    "FastSSCDecoder",
    "SCLDecoder",
]
