"""Sample-collection stage: TextGrid alignment -> per-subject sample npz.

Stage contract ``run(config) -> output_dir`` with the reference's
semantics (``/root/reference/extract_samples.py``): per-subject TextGrid
parsing, event figure snapshots, epoch extraction, content-hashed output
dir ``<recording base>__<md5[:6]>``, skip-if-exists unless ``overwrite``,
and provenance config chaining.
"""

from __future__ import annotations

import hashlib
import os
from typing import List

import numpy as np
import yaml

from ..config import dict_to_namespace, update_configuration
from .text_align import extract_ecog_audio, handle_textgrids


def run(config: dict) -> str:
    """Extract samples for every configured subject."""
    collection_cfg = config.get("sample_collection", {})
    params_config = collection_cfg.get("params", {})
    params_dict = {}
    for section in ("io", "settings"):
        params_dict.update(params_config.get(section, {}) or {})
    params = dict_to_namespace(params_dict)

    if not hasattr(params, "overwrite"):
        params.overwrite = False
    figures = getattr(params, "figures", True)

    output_dir_name = _generate_output_dir_name(
        os.path.basename(os.path.normpath(params.recording_dir)), collection_cfg
    )
    output_dir = os.path.join(params.output_dir, output_dir_name)
    os.makedirs(output_dir, exist_ok=True)

    figure_root = os.path.join(output_dir, "figures")
    if figures:
        os.makedirs(figure_root, exist_ok=True)

    update_configuration(
        output_path=os.path.join(output_dir, "config.yaml"),
        previous_config_path=os.path.join(params.recording_dir, "config.yaml"),
        new_module="sample_collection",
        new_module_cfg=collection_cfg,
    )

    # Multi-host: each process extracts its round-robin share of subjects
    # (identity under a single process). Outputs are per-subject files in
    # a shared dir, so there is no write contention across processes.
    from ..parallel.distributed import host_shard

    subject_items = host_shard(
        list((params_config.get("subjects", {}) or {}).items())
    )
    for subject_id, subject_params in subject_items:
        subject_path = os.path.join(params.recording_dir, f"subject_{subject_id}")
        if not os.path.exists(subject_path):
            print(f"No recording directory at {subject_path}; subject skipped.")
            continue

        subject_output_path = os.path.join(output_dir, f"subject_{subject_id}.npz")
        if os.path.exists(subject_output_path) and not params.overwrite:
            print(f"Reusing cached samples at {subject_output_path} (pass overwrite to redo).")
            continue

        textgrid_dir = os.path.join(params.textgrid_root, subject_params["textgrid_dir"])
        if not os.path.exists(textgrid_dir):
            print(f"No TextGrid directory at {textgrid_dir}; subject skipped.")
            continue

        intervals = handle_textgrids(
            textgrid_dir,
            start_offset=subject_params.get("start_offset", 0.0),
            tier_list=subject_params.get("tier_list", None),
            blocks=subject_params.get("blocks", None),
        )

        if len(intervals) == 0:
            raise ValueError(
                "No intervals found in the TextGrid files. "
                "Check the directory and file naming conventions. "
                f"Target blocks: {subject_params.get('blocks', 'all')}"
            )

        if figures:
            _plot_event_snapshots(intervals, subject_path, figure_root, subject_id)

        extract_ecog_audio(
            intervals,
            subject_path,
            syllables=params.syllable_identifiers,
            length=subject_params["sample_length"],
            output_path=subject_output_path,
            rest_period=tuple(subject_params["rest_period"])
            if subject_params.get("rest_period") is not None
            else None,
        )

    return output_dir


def _sample_consecutive_events(events: List[dict], num_events: int) -> List[dict]:
    """A random run of ``num_events`` consecutive events (for figures)."""
    events = sorted(events, key=lambda x: x["start"])
    if len(events) > num_events:
        start_idx = np.random.randint(0, len(events) - num_events + 1)
        return events[start_idx : start_idx + num_events]
    return events


def _plot_event_snapshots(intervals, subject_path, figure_root, subject_id) -> None:
    """Figure of a few consecutive events on random channels per block."""
    from ..utils.visualise import _save_or_show
    import matplotlib.pyplot as plt

    for block_id, block_df in intervals.items():
        if block_df.empty:
            continue
        ecog_path = os.path.join(subject_path, f"B{block_id}_ecog.npz")
        if not os.path.exists(ecog_path):
            continue

        ecog = np.load(ecog_path)
        signal, sf = ecog["data"], int(ecog["sf"])
        events = _sample_consecutive_events(block_df.to_dict("records"), 3)
        channels = np.random.choice(
            signal.shape[0], size=min(5, signal.shape[0]), replace=False
        )

        fig_dir = os.path.join(figure_root, f"subject_{subject_id}")
        os.makedirs(fig_dir, exist_ok=True)

        start_time = max(min(e["start"] for e in events) - 0.5, 0)
        end_time = max(e["end"] for e in events) + 0.5
        s_idx, e_idx = int(start_time * sf), int(end_time * sf)
        time = np.arange(s_idx, e_idx) / sf

        fig, axes = plt.subplots(
            len(channels), 1, figsize=(12, 3 * len(channels)), sharex=True
        )
        axes = np.atleast_1d(axes)
        for ax, ch in zip(axes, channels):
            ax.plot(time, signal[ch, s_idx:e_idx], color="blue", alpha=0.7)
            for i, event in enumerate(events):
                es, ee = int(event["start"] * sf), int(event["end"] * sf)
                ax.plot(np.arange(es, ee) / sf, signal[ch, es:ee], color="orange")
                ax.axvline(event["start"], color="g", linestyle="--", alpha=0.7)
                ax.axvline(event["end"], color="r", linestyle="--", alpha=0.7)
            ax.set_title(f"Channel {ch}")
            ax.set_ylabel("Amplitude")
        axes[-1].set_xlabel("Time (s)")
        fig.suptitle(f"Subject {subject_id} Block {block_id}")
        fig.tight_layout()
        _save_or_show(fig, os.path.join(fig_dir, f"block_{block_id}_events.png"))


def _generate_output_dir_name(base_name: str, collection_cfg: dict) -> str:
    # Hash only inputs that change the extracted samples: subjects +
    # settings + the annotation source (textgrid_root). Volatile io keys
    # (overwrite, output/figure paths) stay out — the reference hashes
    # the whole section, so flipping `overwrite` silently lands in a
    # fresh cache dir (defeating both the cache and the flag).
    params = dict(collection_cfg.get("params", {}) or {})
    io_cfg = params.pop("io", None) or {}
    if io_cfg.get("textgrid_root") is not None:
        params["textgrid_root"] = io_cfg["textgrid_root"]
    hashed_cfg = {**collection_cfg, "params": params}
    hash_input = yaml.dump(hashed_cfg, sort_keys=True)
    hash_part = hashlib.md5(hash_input.encode()).hexdigest()[:6]
    return f"{base_name}__{hash_part}"
