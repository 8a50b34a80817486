"""Data-layer helpers: filename matching, label dynamics, channel set algebra.

Capability parity with ``/root/reference/data_loading/utils.py``. The tone
dynamics are exposed both as the reference's per-sample Python builder and
as a precomputed (tone, syllable) lookup table for on-device gathering
(removing the per-batch host round trip of the reference's synthesis loop;
cf. ``/root/reference/models/synthesis_trainer.py:212-218``).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np


def extract_block_id(filename: str) -> int:
    """Extract the integer block ID from a filename containing ``B<digits>``."""
    match = re.search(r"B(\d+)", filename)
    if match:
        return int(match.group(1))
    raise ValueError(f"No block ID found in filename: {filename}")


def match_filename(
    file: str, file_format: str, kwords: Optional[List[str]] = None
) -> bool:
    """True if ``file`` has the extension and contains all keywords."""
    if not file.endswith(file_format):
        return False
    if kwords:
        return all(word in file for word in kwords)
    return True


def prepare_tone_dynamics(
    tone_dynamic_mapping: Dict[str, List[int]],
    tone_labels: np.ndarray,
    syllable_labels: np.ndarray,
) -> np.ndarray:
    """Per-sample (syllable, tone) dynamic features, shape (N, 2, n_dynamics).

    Row 0 is the constant syllable sequence, row 1 the tone pitch contour —
    the reference's stacking order (``data_loading/utils.py:69-71``).
    """
    if len(tone_labels) != len(syllable_labels):
        raise ValueError("Length of tone labels and syllable labels must match.")

    table, n_dynamics = tone_dynamics_table(tone_dynamic_mapping)
    tones = np.asarray(tone_labels).astype(int)
    sylls = np.asarray(syllable_labels).astype(int)

    known = sorted(int(k) for k in tone_dynamic_mapping.keys())
    for tone in np.unique(tones):
        if int(tone) not in known:
            raise ValueError(
                f"Tone {tone} not found in tone_dynamic_mapping."
                "Available tones in mapping: "
                f"{list(tone_dynamic_mapping.keys())}"
            )

    out = np.empty((len(tones), 2, n_dynamics), dtype=np.float64)
    out[:, 0, :] = sylls[:, None]
    out[:, 1, :] = table[tones]
    return out


def tone_dynamics_table(
    tone_dynamic_mapping: Dict[str, List[int]]
) -> "tuple[np.ndarray, int]":
    """Dense lookup ``table[tone] -> contour`` for on-device gathering.

    Indexed by integer tone id; rows for unmapped ids are zero. Returns
    (table, n_dynamics).
    """
    keys = [int(k) for k in tone_dynamic_mapping.keys()]
    lengths = {len(v) for v in tone_dynamic_mapping.values()}
    if len(lengths) != 1:
        raise ValueError("All tone dynamic sequences must have the same length.")
    n_dynamics = lengths.pop()
    table = np.zeros((max(keys) + 1, n_dynamics), dtype=np.float64)
    for k, v in tone_dynamic_mapping.items():
        table[int(k)] = np.asarray(v, dtype=np.float64)
    return table, n_dynamics


def select_non_discriminative_channels(
    channel_selections: dict, discriminative_keys: List[str]
) -> list:
    """active_channels minus the union of discriminative sets, sorted."""
    non_discriminative = set(channel_selections["active_channels"])
    discriminative: set = set()
    for label in discriminative_keys:
        discriminative.update(channel_selections[label])
    return sorted(non_discriminative - discriminative)
