"""Downsample step plugin (FFT resampling on device).

Contract: ``run(data (C, T), params) -> (C, T')``; updates
``params.signal_freq`` to the target rate, like the reference step
(``/root/reference/preprocess/signal/downsample.py:6-29``).
"""

from __future__ import annotations

from argparse import Namespace

import numpy as np

from ...ops.resample import resample_to_rate


def run(data: np.ndarray, params: Namespace) -> np.ndarray:
    target_freq = getattr(params, "downsample_freq", 400)
    out = resample_to_rate(data, params.signal_freq, target_freq)
    params.signal_freq = target_freq
    return np.asarray(out)
