"""Preprocessor core: per-modality sequential step application.

Same contract as the reference (``/root/reference/preprocess/preprocessor.py``):
- per modality, clone the base params and inject ``signal_freq`` from
  ``<modality>_sf``,
- apply each configured step module's ``run(data, params)`` in order,
- reject parameter-name collisions between steps,
- optionally emit before/after figures per step.
"""

from __future__ import annotations

import os
from argparse import Namespace
from copy import deepcopy
from typing import Optional

import numpy as np

from .. import registry


def preprocess_modalities(
    data_dict: dict,
    modalities_cfg: dict,
    base_params: Namespace,
    figure_dir: Optional[str] = None,
) -> dict:
    """Preprocess each modality according to its type and configured steps."""
    for modality, cfg in modalities_cfg.items():
        mod_type = cfg.get("type")
        if mod_type is None:
            raise KeyError(f"Modality '{modality}' missing 'type' field in config")

        steps = cfg.get("preprocessing", {}).get("steps", [])
        if not steps:
            continue

        mod_fig_dir = os.path.join(figure_dir, modality) if figure_dir else None
        if mod_fig_dir:
            os.makedirs(mod_fig_dir, exist_ok=True)

        params = deepcopy(base_params)

        if mod_type == "signal":
            params.signal_freq = data_dict.get(f"{modality}_sf")
            processed, freq = preprocess_signal(
                data_dict[modality], steps, params, figure_dir=mod_fig_dir
            )
            if freq is not None:
                data_dict[f"{modality}_sf"] = freq
            data_dict[modality] = processed
        else:
            raise ValueError(
                f"Unsupported modality type '{mod_type}' for '{modality}'."
            )

    return data_dict


def preprocess_signal(
    data: np.ndarray,
    steps: list,
    block_params: Namespace,
    figure_dir: Optional[str] = None,
    num_channels: int = 5,
    duration: float = 1.0,
):
    """Apply preprocessing steps sequentially; returns (data, final_freq)."""
    for i, step in enumerate(steps):
        module_name = step["module"]
        step_params = step.get("params", {}) or {}

        for key, value in step_params.items():
            if hasattr(block_params, key):
                raise ValueError(
                    f"Parameter '{key}' already exists in params. "
                    "Please ensure no conflicting parameter names "
                    "in each preprocessing step."
                )
            setattr(block_params, key, value)

        # Materializing the pre-step signal costs a device->host readback
        # per step — only pay it when figures are actually requested.
        before_data = np.asarray(data) if figure_dir else None
        before_freq = block_params.signal_freq

        module = registry.resolve(module_name)
        data = module.run(data, block_params)

        if figure_dir and np.ndim(data) == 2:
            from ..utils.visualise import plot_preprocessing_step

            plot_preprocessing_step(
                before_data,
                before_freq,
                np.asarray(data),
                block_params.signal_freq,
                figure_dir,
                i,
                module_name,
                num_channels=num_channels,
                duration=duration,
            )

    return data, block_params.signal_freq
