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
from .large import LargeSCDecoder, LargeSCLDecoder
from .adaptive import AdaptiveDecoder
from .scan import ScanDecoder, FastSScanDecoder
from .depthfirst import DepthFirstDecoder
from .errorlocator import ErrorLocator
from .puncturer import Puncturer

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
    "LargeSCDecoder",
    "LargeSCLDecoder",
    "AdaptiveDecoder",
    "ScanDecoder",
    "FastSScanDecoder",
    "DepthFirstDecoder",
    "ErrorLocator",
    "Puncturer",
]
