"""Results analysis (reference python/analyze_results.py equivalents).

Reads the simulator's pcsim-schema CSV into structured records and
produces per-(N,K,L) BLER/BER curve summaries.
"""

from __future__ import annotations

import csv
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np


def read_results_csv(path: str) -> List[Dict[str, float]]:
    """Parse a `<output>_<simtype>.csv` file into a list of row dicts."""
    rows = []
    with open(path) as f:
        reader = csv.DictReader(f)
        for raw in reader:
            rows.append(
                {k.strip('"'): _coerce(v) for k, v in raw.items() if k}
            )
    return rows


def _coerce(value):
    try:
        f = float(value)
        return int(f) if f.is_integer() and "e" not in value.lower() else f
    except (TypeError, ValueError):
        return value


def summarize_results(
    rows: List[Dict[str, float]]
) -> Dict[Tuple, Dict[str, np.ndarray]]:
    """Group rows by (N, K, L, C) and return per-group sorted curves:
    {'ebn0': [...], 'bler': [...], 'ber': [...], 'throughput_mbps': [...]}.
    """
    groups = defaultdict(list)
    for r in rows:
        groups[(r.get("N"), r.get("K"), r.get("L"), r.get("C"))].append(r)
    out = {}
    for key, rws in groups.items():
        rws.sort(key=lambda r: r.get("Eb/N0", 0.0))
        out[key] = {
            "ebn0": np.array([r.get("Eb/N0", 0.0) for r in rws]),
            "bler": np.array([r.get("BLER", 0.0) for r in rws]),
            "ber": np.array([r.get("BER", 0.0) for r in rws]),
            "throughput_mbps": np.array(
                [r.get("Coded Bitrate", 0.0) / 1e6 for r in rws]
            ),
        }
    return out


def plot_bler_curves(rows, path: str = None):
    """BLER-vs-Eb/N0 semilog plot (plot_polar_code_benchmark.py analogue);
    requires matplotlib."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for key, c in summarize_results(rows).items():
        n_len, k_len, l_size, crc = key
        ax.semilogy(
            c["ebn0"], np.maximum(c["bler"], 1e-99),
            marker="o", label=f"N={n_len} K={k_len} L={l_size} C={crc}",
        )
    ax.set_xlabel("Eb/N0 [dB]")
    ax.set_ylabel("BLER")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=8)
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
    return fig
