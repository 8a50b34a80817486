"""Rolling-window z-score step plugin (pandas-parity, on device).

Cf. ``/root/reference/preprocess/signal/rolling_zscore.py:5-49``.
"""

from __future__ import annotations

from argparse import Namespace

import numpy as np

from ...ops.rereference import rolling_zscore


def run(data: np.ndarray, params: Namespace) -> np.ndarray:
    window_length = getattr(params, "window_length", 10)
    window_size = int(window_length * params.signal_freq)
    preserve_nans = getattr(params, "preserve_nans", True)

    if window_size <= 1:
        raise ValueError("window_size must be greater than 1.")

    # Device array out: host materialization happens once, at block save.
    return rolling_zscore(data, window_size, fill_nans=not preserve_nans)
