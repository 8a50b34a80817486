"""Channel-selection helpers: Bonferroni + consecutive-run-length filtering.

Vectorized equivalents of ``/root/reference/channel_selection/utils.py``,
with the reference's bugs fixed: ``find_significant_channels`` actually
fills ``max_lengths`` (the reference always returned ``[]``,
``utils.py:66-76``).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..ops.runlength import max_consecutive_true


def get_max_length(indices: np.ndarray) -> int:
    """Longest run of consecutive integers in a sorted index array."""
    if len(indices) == 0:
        return 0
    mask = np.zeros(int(indices[-1]) + 1, dtype=bool)
    mask[np.asarray(indices, dtype=int)] = True
    return int(max_consecutive_true(mask))


def find_significant_channels(
    p_values: np.ndarray,
    pvalue_threshold: float = 0.05,
    length_threshold: int = 10,
) -> Tuple[List[int], List[int]]:
    """Channels whose longest consecutively-significant run exceeds the
    threshold, with Bonferroni correction over timepoints.

    ``p_values``: (n_channels, n_timepoints). Returns (channels, max_lengths).
    """
    corrected = pvalue_threshold / p_values.shape[1]
    sig = np.asarray(p_values) < corrected
    runs = np.asarray(max_consecutive_true(sig))

    significant_channels: List[int] = []
    max_lengths: List[int] = []
    for ch in range(p_values.shape[0]):
        if sig[ch].any() and runs[ch] > length_threshold:
            significant_channels.append(ch)
            max_lengths.append(int(runs[ch]))
    return significant_channels, max_lengths
