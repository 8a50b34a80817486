"""Common-average-reference step plugin.

Cf. ``/root/reference/preprocess/signal/car_rereference.py:5-41``.
"""

from __future__ import annotations

from argparse import Namespace

import numpy as np

from ...ops.rereference import car_rereference


def run(data: np.ndarray, params: Namespace) -> np.ndarray:
    exclude = getattr(params, "exclude_channels", []) or []
    if not isinstance(exclude, list):
        raise ValueError("exclude_channels must be a list of integers.")
    # Device array out: host materialization happens once, at block save.
    return car_rereference(data, exclude_channels=exclude)
