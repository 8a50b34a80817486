"""Downsample step plugin (on-device resampling).

Contract: ``run(data (C, T), params) -> (C, T')``; updates
``params.signal_freq`` to the target rate, like the reference step
(``/root/reference/preprocess/signal/downsample.py:6-29``). Short
signals use the exact FFT method; recording-length signals route to the
polyphase FIR kernel (TPU cannot compile full-length non-pow2 FFTs).
``params.resample_method`` ("auto"/"fft"/"poly") overrides.
"""

from __future__ import annotations

from argparse import Namespace

import numpy as np

from ...ops.resample import resample_to_rate


def run(data: np.ndarray, params: Namespace) -> np.ndarray:
    target_freq = getattr(params, "downsample_freq", 400)
    method = getattr(params, "resample_method", "auto")
    out = resample_to_rate(data, params.signal_freq, target_freq, method=method)
    params.signal_freq = target_freq
    # Returned as a device array: the step chain stays on-chip; the block
    # writer (io.*.save_block) materializes to host exactly once.
    return out
