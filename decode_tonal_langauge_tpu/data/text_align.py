"""TextGrid-driven ERP/audio epoch extraction.

Capability parity with ``/root/reference/data_loading/text_align.py``:
``handle_textgrids`` parses per-block Praat annotations into interval
DataFrames (digit-leading marks ``<tone><syllable>``, offset application,
overlap skipping, 0.1 s rounding), and ``extract_ecog_audio`` slices
aligned ECoG (C, T) -> (N, C, L) and audio -> (N, L) windows at their
native rates, encodes labels, tiles rest windows, merges blocks and writes
the sample npz. The window slicing itself is a batched on-device gather
(``ops.framing``).

Deviations from the reference (documented quirk fixes):
- audio recordings match the keyword 'sound' *or* 'audio' (the reference
  writes ``B<n>_audio.npz`` but then greps for 'sound' only;
  ``text_align.py:342`` vs ``tdt_blocks.py:33``),
- tier filtering lowercases both sides.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..ops.framing import extract_epochs, extract_epochs_1d, tile_rest_windows
from .textgrid import TextGrid
from .utils import extract_block_id, match_filename


def handle_textgrids(
    data_dir: str,
    start_offset: float = 0.0,
    end_offset: float = 0.0,
    tier_list: Optional[List[str]] = None,
    blocks: Optional[List[int]] = None,
) -> Dict[int, pd.DataFrame]:
    """Parse each block's TextGrid into an interval DataFrame.

    File naming convention: a block id ``B<n>`` somewhere in the filename;
    each block is loaded once.
    """
    intervals: Dict[int, pd.DataFrame] = {}

    for file in sorted(os.listdir(data_dir)):
        if not file.endswith(".TextGrid"):
            continue
        block_number = extract_block_id(file)
        if blocks is not None and block_number not in blocks:
            continue
        if block_number in intervals:
            continue

        tg = TextGrid.from_file(os.path.join(data_dir, file))
        intervals[block_number] = read_textgrid(tg, start_offset, end_offset, tier_list)
        print(
            f"Maximum time for block {block_number}:",
            get_textgrid_time(tg, tier_list),
            " s",
        )

    return intervals


def get_textgrid_time(tg: TextGrid, tier_list: Optional[List[str]] = None) -> float:
    """Maximum interval end time over the selected tiers (block duration
    report, ``/root/reference/data_loading/text_align.py:155-186``)."""
    if tier_list is None:
        tier_list = [tier.name.lower() for tier in tg.tiers]
    return max(
        (
            interval.maxTime
            for tier in tg.tiers
            if tier.name.lower() in tier_list
            for interval in tier.intervals
        ),
        default=0.0,
    )


def read_textgrid(
    tg: TextGrid,
    start_offset: float,
    end_offset: float,
    tier_list: Optional[List[str]] = None,
) -> pd.DataFrame:
    """Intervals whose mark starts with a digit: ``<tone digit><syllable char>``."""
    trial_list = []

    if tier_list is None:
        wanted = {tier.name.lower() for tier in tg.tiers}
    else:
        wanted = {name.lower() for name in tier_list}

    for tier in tg.tiers:
        if tier.name.lower() not in wanted:
            continue
        for interval in tier.intervals:
            if len(interval.mark) == 0:
                continue
            if not interval.mark[0].isdigit():
                continue

            tone = int(interval.mark[0])
            syllable = interval.mark[1]
            start = interval.minTime - start_offset
            end = interval.maxTime + end_offset

            if trial_list and start < trial_list[-1]["end"]:
                warnings.warn(
                    f"Overlapping intervals detected in tier '{tier.name}' "
                    f"at time {interval.minTime:.2f} for syllable '{syllable}', "
                    f"previous end time was {trial_list[-1]['end']:.2f}. "
                    "Skipping this interval ... "
                )
                continue

            trial_list.append(
                {
                    "start": float(np.around(start, decimals=1)),
                    "end": float(np.around(end, decimals=1)),
                    "syllable": syllable,
                    "tone": tone,
                }
            )

    return pd.DataFrame(trial_list)


def _load_recording(path: str, file: str) -> Tuple[np.ndarray, float]:
    dataset = np.load(path)
    for key in ("data", "sf"):
        if key not in dataset:
            raise KeyError(
                f"Expected key '{key}' not found in the npz file {file}. "
                f"Existing keys {list(dataset.keys())}."
            )
    return dataset["data"], float(dataset["sf"])


def extract_ecog_audio(
    intervals: Dict[int, pd.DataFrame],
    recording_dir: str,
    syllables: List[str],
    length: float = 1.0,
    output_path: Optional[str] = None,
    rest_period: Optional[Tuple[float, float]] = None,
    recording_format: str = "npz",
) -> Dict[str, np.ndarray]:
    """Extract aligned ECoG/audio windows and labels; save as sample npz.

    Output keys: ``ecog (N, C, L_e)``, ``ecog_sf``, ``audio (N, L_a)``,
    ``audio_sf``, ``syllable (N,)``, ``tone (N,)`` and, when a rest period
    is given, ``ecog_rest``.
    """
    erp_samples: Dict[int, np.ndarray] = {}
    ecog_rest_samples: Dict[int, np.ndarray] = {}
    audio_samples: Dict[int, np.ndarray] = {}
    syllable_labels: Dict[int, np.ndarray] = {}
    tone_labels: Dict[int, np.ndarray] = {}
    ecog_sampling_rate = audio_sampling_rate = None

    for file in sorted(os.listdir(recording_dir)):
        is_ecog = match_filename(file, recording_format, ["ecog"])
        is_audio = match_filename(file, recording_format, ["sound"]) or match_filename(
            file, recording_format, ["audio"]
        )
        if not (is_ecog or is_audio):
            continue

        block = extract_block_id(file)
        if block not in intervals:
            continue

        store = erp_samples if is_ecog else audio_samples
        if block in store:
            warnings.warn(
                f"Found multiple {'ECoG' if is_ecog else 'audio'} files for "
                f"block {block}, skipping file {file}. "
            )
            continue

        data, sf = _load_recording(os.path.join(recording_dir, file), file)
        seg_len = int(length * sf)
        starts = (intervals[block]["start"].to_numpy() * sf).astype(int)

        if len(starts) and starts.max() + seg_len > data.shape[1]:
            raise ValueError(
                f"Requested sample length exceeds data length for block {block}. "
                f"Max start: {starts.max()}, End: {starts.max() + seg_len}; "
                f"Data length: {data.shape[1]}."
            )

        if is_ecog:
            ecog_sampling_rate = sf
            erp_samples[block] = np.asarray(extract_epochs(data, starts, seg_len))
            tone_labels[block] = intervals[block]["tone"].to_numpy()
            codes = pd.Categorical(
                intervals[block]["syllable"], categories=syllables
            ).codes
            syllable_labels[block] = np.asarray(codes)

            if rest_period is not None:
                interval_earliest = float(intervals[block]["start"].min())
                rest_start = int(rest_period[0] * sf)
                rest_end = int(rest_period[1] * sf)
                if rest_period[1] > interval_earliest:
                    warnings.warn(
                        f"Rest period end ({rest_period[1]} s) is after the "
                        f"earliest interval start for block {block} "
                        f"(earliest event time: {interval_earliest} s). "
                        "Reducing rest period end ..."
                    )
                    rest_end = int(interval_earliest * sf)
                rest_starts = tile_rest_windows(rest_start, rest_end, seg_len)
                ecog_rest_samples[block] = np.asarray(
                    extract_epochs(data, rest_starts, seg_len)
                )
        else:
            audio_sampling_rate = sf
            # Mono audio: first row of a (1, T) array, or a (T,) series.
            series = data[0] if data.ndim == 2 else data
            audio_samples[block] = np.asarray(
                extract_epochs_1d(series, starts, seg_len)
            )

    block_ids = list(audio_samples.keys())
    if set(erp_samples.keys()) != set(block_ids):
        raise ValueError(
            "Mismatch between ECoG and audio samples blocks. "
            "Ensure both ECoG and audio files are present for each block."
            f" ECoG blocks found: {list(erp_samples.keys())},"
            f" Audio blocks found: {block_ids}."
        )
    if len(block_ids) == 0:
        raise ValueError(
            "No valid blocks found in the specified directories."
            f"Blocks in textgrids: {list(intervals.keys())}. "
        )

    all_erp = np.concatenate([erp_samples[b] for b in block_ids], axis=0)
    all_audio = np.concatenate([audio_samples[b] for b in block_ids], axis=0)
    all_syll = np.concatenate([syllable_labels[b] for b in block_ids], axis=0)
    all_tone = np.concatenate([tone_labels[b] for b in block_ids], axis=0)

    min_label = np.min(all_tone)
    if min_label > 0:
        all_tone = all_tone - min_label  # shift tone labels to start from 0

    output_data = {
        "ecog": all_erp,
        "ecog_sf": ecog_sampling_rate,
        "audio": all_audio,
        "audio_sf": audio_sampling_rate,
        "syllable": all_syll,
        "tone": all_tone,
    }
    if rest_period is not None:
        output_data["ecog_rest"] = np.concatenate(
            [ecog_rest_samples[b] for b in block_ids], axis=0
        )

    if output_path is not None:
        np.savez(output_path, **output_data)

    return output_data
