"""Channel-selection stage entry.

``run(config) -> output_dir``: for every subject sample npz, run each
configured selection plugin, collect its ``selected_channels`` under its
``selection_name``, optionally call its ``generate_figures``, and dump a
per-subject JSON. Mirrors ``/root/reference/channel_selection_main.py``.
"""

from __future__ import annotations

import json
import os
import sys
import warnings

import numpy as np

from .. import registry
from ..config import (
    dict_to_namespace,
    generate_hash_name_from_config,
    load_config,
    update_configuration,
)


def run(config: dict) -> str:
    ch_cfg = config.get("channel_selection", {})
    ch_params = ch_cfg.get("params", {})
    io_dict = ch_params.get("io", {})

    params = dict_to_namespace(io_dict)
    figures = getattr(params, "figures", True)

    output_dir_name = generate_hash_name_from_config(
        os.path.basename(os.path.normpath(params.sample_dir)), ch_cfg
    )
    output_dir = os.path.join(params.output_dir, output_dir_name)
    os.makedirs(output_dir, exist_ok=True)

    figure_root = os.path.join(output_dir, "figures")
    if figures:
        os.makedirs(figure_root, exist_ok=True)

    update_configuration(
        output_path=os.path.join(output_dir, "config.yaml"),
        previous_config_path=os.path.join(params.sample_dir, "config.yaml"),
        new_module="channel_selection",
        new_module_cfg=ch_cfg,
    )

    # Multi-host: each process selects channels for its share of subjects
    # (identity single-process); outputs are per-subject JSONs, no
    # cross-process write contention.
    from ..parallel.distributed import host_shard

    subject_files = host_shard(
        [
            f
            for f in sorted(os.listdir(params.sample_dir))
            if f.endswith(".npz") and f.startswith("subject_")
        ]
    )
    for file_name in subject_files:
        subject_id = file_name.split("_")[1].split(".")[0]
        data = np.load(os.path.join(params.sample_dir, file_name))

        subject_results = {}

        for module_cfg in ch_params.get("selections", []):
            module_name = module_cfg["module"]
            selection_name = module_cfg["selection_name"]
            module_params = module_cfg.get("params", {})

            module = registry.resolve(module_name)
            module_results = module.run(data, module_params)

            subject_results[selection_name] = [
                int(c) for c in module_results["selected_channels"]
            ]

            if len(subject_results[selection_name]) == 0:
                warnings.warn(
                    "No active channels found for selection "
                    f"{selection_name} in subject {subject_id}."
                )

            if figures and hasattr(module, "generate_figures"):
                module_figure_dir = os.path.join(
                    figure_root, selection_name, f"subject_{subject_id}"
                )
                os.makedirs(module_figure_dir, exist_ok=True)
                module.generate_figures(
                    data, module_results, module_params, figure_dir=module_figure_dir
                )

        output_file = os.path.join(output_dir, f"subject_{subject_id}.json")
        with open(output_file, "w") as f:
            json.dump(subject_results, f, indent=4)

    return output_dir


if __name__ == "__main__":
    if len(sys.argv) != 2:
        raise SystemExit(
            "Usage: python -m decode_tonal_langauge_tpu.channel_selection.main <config.yaml>"
        )
    from ..runtime.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    run(load_config(sys.argv[1]))
