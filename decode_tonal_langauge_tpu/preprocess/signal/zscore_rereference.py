"""Interval z-score re-reference step plugin.

Z-scores each channel by the mean/std over a configured time interval
(e.g. the first 25 s of rest), cf.
``/root/reference/preprocess/signal/zscore_rereference.py:6-70``.
"""

from __future__ import annotations

from argparse import Namespace

import numpy as np

from ...ops.rereference import interval_zscore


def run(data: np.ndarray, params: Namespace) -> np.ndarray:
    if not hasattr(params, "rereference_interval") or not hasattr(
        params, "signal_freq"
    ):
        raise ValueError(
            "params must have 'rereference_interval' and 'signal_freq' attributes."
        )

    start_s, end_s = params.rereference_interval
    start = int(start_s * params.signal_freq)
    end = int(end_s * params.signal_freq)

    if start < 0 or end > data.shape[1]:
        raise ValueError("Reference time indices are out of bounds.")
    if start >= end:
        raise ValueError("Start time must be less than end time.")

    # Device array out: host materialization happens once, at block save.
    return interval_zscore(data, start, end)
