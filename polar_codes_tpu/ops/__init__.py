from .butterfly import butterfly_transform, butterfly_transform_bipolar
from .fg import (
    f_minsum,
    g_update,
    combine_bipolar,
    split_llr,
    merge_bits,
)

__all__ = [
    "butterfly_transform",
    "butterfly_transform_bipolar",
    "f_minsum",
    "g_update",
    "combine_bipolar",
    "split_llr",
    "merge_bits",
]
