"""Host-side analysis & construction tooling.

Capability parity with the reference's pure-python tool layer
(/root/reference/python/): polar_code_tools.py (GF(2) matrices, involution
helpers), polar_5g_parameters.py (NR positions + rate matching),
frozen_bit_positions.py (strategy classes), channel_simulation.py (noise
calibration), analyze_results/plot scripts (CSV analysis), and the PCTree
GUI (tree rendering, here as text/matplotlib).
"""

from .code_tools import (
    polar_generator_matrix,
    systematic_encoder_matrix,
    bit_reverse,
    bit_reversed_vector,
    frozen_indices_to_map,
    info_indices_from_frozen,
)
from .fiveg_tools import (
    nr_subblock_interleave,
    nr_rate_match,
    nr_rate_recover,
)
from .strategies import (
    FrozenBitPositions,
    FrozenBitPositionsBB,
    FrozenBitPositionsBE,
    FrozenBitPositionsGA,
    FrozenBitPositions5G,
    get_frozen_bit_generator,
)
from .channel_tools import ebn0_to_sigma, sigma_to_ebn0, ebn0_to_esn0_linear
from .analysis import (read_results_csv, summarize_results,
                       merge_results, parse_bench_name,
                       load_benchmark_jsonl, compare_grids,
                       plot_bler_overlay, plot_fer_throughput_combo,
                       plot_grid_throughput)
from .visualize import render_tree_text, render_tree_figure

__all__ = [
    "polar_generator_matrix",
    "systematic_encoder_matrix",
    "bit_reverse",
    "bit_reversed_vector",
    "frozen_indices_to_map",
    "info_indices_from_frozen",
    "nr_subblock_interleave",
    "nr_rate_match",
    "nr_rate_recover",
    "FrozenBitPositions",
    "FrozenBitPositionsBB",
    "FrozenBitPositionsBE",
    "FrozenBitPositionsGA",
    "FrozenBitPositions5G",
    "get_frozen_bit_generator",
    "ebn0_to_sigma",
    "sigma_to_ebn0",
    "ebn0_to_esn0_linear",
    "read_results_csv",
    "summarize_results",
    "render_tree_text",
    "render_tree_figure",
]
