"""Global per-channel z-score step plugin.

Cf. ``/root/reference/preprocess/signal/channel_zscore.py:5-29``.
"""

from __future__ import annotations

from argparse import Namespace

import numpy as np

from ...ops.rereference import channel_zscore


def run(data: np.ndarray, params: Namespace) -> np.ndarray:
    preserve_nans = getattr(params, "preserve_nans", True)
    # Device array out: host materialization happens once, at block save.
    return channel_zscore(data, fill_nans=not preserve_nans)
