"""Visualisation stage: figures from upstream stage artifacts.

The reference lists ``visualisation`` in the pipeline's STAGES but ships
no module for it (``/root/reference/main.py:8-15`` — the entry is always
skipped); this completes the surface. Consumes the training stage's
``results.csv`` (metric scatter per subject) and the channel-selection
JSONs (three-set Venn diagram), writing PNGs into a ``figures/``
directory.

Config::

    visualisation:
      module: visualisation_main
      params:
        io:
          output_dir: figures          # default: <results_dir>/figures
          # results_dir / channel_selection_dir are threaded from the
          # upstream stages automatically
        metrics: [accuracy]            # one scatter per metric
        chance_levels: {accuracy: 0.25}
        venn_sets: [active_channels, tone_discriminative,
                    syllable_discriminative]
"""

from __future__ import annotations

import json
import os
from typing import Optional

import pandas as pd

from ..utils.visualise import plot_channel_venn_diagram, plot_metric


def run(config: dict) -> Optional[str]:
    stage_cfg = config.get("visualisation", {}) or {}
    params = stage_cfg.get("params", {}) or {}
    io_cfg = params.get("io", {}) or {}

    results_dir = io_cfg.get("results_dir")
    selection_dir = io_cfg.get("channel_selection_dir")
    output_dir = io_cfg.get("output_dir") or (
        os.path.join(results_dir, "figures") if results_dir else "figures"
    )
    os.makedirs(output_dir, exist_ok=True)

    made_any = False

    # ---- metric scatter(s) from results.csv ----
    results_file = (
        os.path.join(results_dir, "results.csv") if results_dir else None
    )
    if results_file and os.path.exists(results_file):
        df = pd.read_csv(results_file)
        rows = df.to_dict("records")
        metrics = params.get("metrics") or _metrics_in(df)
        chance = params.get("chance_levels", {}) or {}
        for metric in metrics:
            if f"{metric}_mean" not in df.columns:
                print(f"No '{metric}_mean' column in {results_file}; skipped.")
                continue
            path = os.path.join(output_dir, f"{metric}_by_subject.png")
            plot_metric(
                rows, metric, chance_level=chance.get(metric), figure_path=path
            )
            made_any = True

    # ---- channel-set Venn diagrams per subject ----
    venn_sets = params.get(
        "venn_sets",
        ["active_channels", "tone_discriminative", "syllable_discriminative"],
    )
    if selection_dir and os.path.isdir(selection_dir) and len(venn_sets) != 3:
        print(
            f"Venn diagrams need exactly 3 channel sets, got {len(venn_sets)} "
            f"({venn_sets}); skipping venn figures."
        )
    if selection_dir and os.path.isdir(selection_dir) and len(venn_sets) == 3:
        for fname in sorted(os.listdir(selection_dir)):
            if not (fname.startswith("subject_") and fname.endswith(".json")):
                continue
            with open(os.path.join(selection_dir, fname)) as f:
                selections = json.load(f)
            if not all(k in selections for k in venn_sets):
                continue
            subject = fname.replace(".json", "")
            path = os.path.join(output_dir, f"{subject}_channel_venn.png")
            plot_channel_venn_diagram(
                {k: set(selections[k]) for k in venn_sets}, figure_path=path
            )
            made_any = True

    if not made_any:
        print("Visualisation stage found nothing to plot.")
        return None
    print(f"Figures written to {output_dir}")
    return output_dir


def _metrics_in(df: pd.DataFrame) -> list:
    return sorted(
        {
            c[: -len("_mean")]
            for c in df.columns
            if c.endswith("_mean") and c != "model_mean"
        }
    )
