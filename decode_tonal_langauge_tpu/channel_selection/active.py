"""Active-channel selection: event vs rest one-way ANOVA per timepoint.

Plugin contract ``run(data, params) -> {selected_channels, max_lengths,
p_values}`` plus ``generate_figures`` — same as the reference
(``/root/reference/channel_selection/active.py``), but the per-channel
SciPy loop becomes one vectorized (C, T) ANOVA on device, and the quirks
are fixed: ``p_values`` holds the full (C, T) array rather than the last
channel's vector (``active.py:84``).
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np

from ..ops.anova import f_oneway_two_groups
from ..ops.runlength import max_consecutive_true


def run(data: dict, params: dict) -> dict:
    """Identify channels whose ERP activity differs from rest."""
    erp_name = params.get("erp_name", "ecog")
    rest_name = params.get("rest_name", "ecog_rest")

    if "ecog_sf" not in data:
        raise ValueError("ECoG sampling frequency (ecog_sf) not found in the data.")
    ecog_sf = float(data["ecog_sf"])
    length_threshold = int(params["active_time_threshold"] * ecog_sf)

    for name in (rest_name, erp_name):
        if name not in data:
            raise KeyError(
                f"Recording '{name}' not found in data."
                f"Available keys: {list(data.keys())}"
            )

    rest_samples = np.asarray(data[rest_name])  # (Nr, C, T)
    erp_samples = np.asarray(data[erp_name])  # (Ne, C, T)

    if erp_samples.shape[1] != rest_samples.shape[1]:
        raise ValueError(
            f"Shape mismatch between '{erp_name}' and '{rest_name}': "
            f"{erp_samples.shape[1:]} vs {rest_samples.shape[1:]}."
        )

    n_timepoints = rest_samples.shape[2]
    corrected_p_threshold = params["p_threshold"] / n_timepoints

    _, p_vals = f_oneway_two_groups(rest_samples, erp_samples)  # (C, T)
    p_vals = np.asarray(p_vals)

    sig = p_vals < corrected_p_threshold
    runs = np.asarray(max_consecutive_true(sig))

    active_channels = []
    max_lengths = []
    for ch in range(p_vals.shape[0]):
        if not sig[ch].any():
            continue
        if runs[ch] > length_threshold:
            active_channels.append(ch)
            max_lengths.append(int(runs[ch]))

    print(f"{len(active_channels)} channels pass the activity test.")

    return {
        "selected_channels": active_channels,
        "max_lengths": max_lengths,
        "p_values": p_vals,
    }


def generate_figures(
    data: dict, results: dict, params: dict, figure_dir: str
) -> None:
    """Run-length histogram + rest-vs-ERP traces for sampled channels."""
    import matplotlib.pyplot as plt

    ecog_sf = float(data["ecog_sf"])
    lengths = results["max_lengths"]
    channels = results["selected_channels"]
    p_vals = np.asarray(results["p_values"])

    os.makedirs(figure_dir, exist_ok=True)
    figure_path = os.path.join(figure_dir, "active_lengths.png")
    fig = plt.figure(figsize=(10, 6))
    plt.hist(np.array(lengths) / ecog_sf, bins=30, alpha=0.7, color="blue")
    plt.title("Distribution of Active Length of Significant Channels")
    plt.xlabel("Active length (s)")
    plt.ylabel("Frequency")
    fig.savefig(figure_path, dpi=150)
    plt.close(fig)

    n_channels_plot = min(10, len(channels))
    for ch in random.sample(list(channels), n_channels_plot):
        plot_rest_erp(
            np.asarray(data["ecog_rest"])[:, ch, :],
            np.asarray(data["ecog"])[:, ch, :],
            p_vals=p_vals[ch],
            p_val_threshold=params["p_threshold"],
            sampling_rate=ecog_sf,
            figure_path=os.path.join(figure_dir, f"channel_{ch}_erp_rest.png"),
        )


def plot_rest_erp(
    rest_data: np.ndarray,
    erp_data: np.ndarray,
    p_vals: np.ndarray,
    p_val_threshold: float = 0.05,
    sampling_rate: float = 400,
    figure_path: Optional[str] = None,
) -> None:
    """Mean +/- SEM of rest vs ERP activity, with the p-value trace."""
    import matplotlib.pyplot as plt

    if rest_data.shape[1] != erp_data.shape[1]:
        raise ValueError("Rest and ERP data must have the same number of timepoints.")

    n_timepoints = rest_data.shape[1]
    time = np.linspace(0, n_timepoints / sampling_rate, n_timepoints)

    fig, axes = plt.subplots(1, 2, figsize=(16, 6))
    for arr, label, color in (
        (rest_data, "Rest", "blue"),
        (erp_data, "ERP", "orange"),
    ):
        mean = arr.mean(axis=0)
        sem = arr.std(axis=0) / np.sqrt(arr.shape[0])
        axes[0].plot(time, mean, label=f"{label} Mean ± SEM", color=color)
        axes[0].fill_between(time, mean - sem, mean + sem, color=color, alpha=0.2)
    axes[0].set_title("Rest vs ERP mean activity")
    axes[0].set_xlabel("Time (s)")
    axes[0].set_ylabel("Amplitude")
    axes[0].legend()
    axes[0].grid(True)

    axes[1].plot(time, p_vals, label="P-values", color="red")
    axes[1].axhline(
        y=p_val_threshold, color="black", linestyle="--", label="Significance Threshold"
    )
    axes[1].set_title("P-values Over Time")
    axes[1].set_xlabel("Time (s)")
    axes[1].set_ylabel("P-value")
    axes[1].legend()
    axes[1].grid(True)

    if figure_path:
        fig.savefig(figure_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    else:  # pragma: no cover
        plt.show()
