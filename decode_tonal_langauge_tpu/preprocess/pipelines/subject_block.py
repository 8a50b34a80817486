"""Subject/block preprocessing pipeline.

Iterates ``HS<subject>-B<block>`` directories under the IO root, loads each
block via the configured IO backend, preprocesses every modality, and saves
per-subject outputs into a content-hash-named setup directory with a
provenance ``config.yaml``. Mirrors
``/root/reference/preprocess/pipelines/subject_block.py`` including the
setup-dir naming scheme ``<step names>_<md5(steps)[:6]>``.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Dict, Optional

import yaml

from ...config import dict_to_namespace, namespace_to_dict


def get_block_id(dirname: str) -> Optional[int]:
    """Extract the block ID from an ``HS<subject>-B<block>`` directory name."""
    try:
        return int(dirname.split("-")[-1].replace("B", ""))
    except ValueError:
        print(
            f"Skipping directory '{dirname}' as it does not match expected format.",
            "Expected format: 'HS<subject_id>-<block_id>'.",
        )
        return None


def iter_blocks(root_dir: str, subject_dirs, subject_ids=None):
    """Yield (subject_id, block_id, block_path) tuples."""
    if subject_ids is None:
        subject_ids = [i + 1 for i in range(len(subject_dirs))]

    for subject_id, subject_dir in zip(subject_ids, subject_dirs):
        subject_path = os.path.join(root_dir, subject_dir)
        for dir_name in sorted(os.listdir(subject_path)):
            block_id = get_block_id(dir_name)
            if block_id is None:
                continue
            yield subject_id, block_id, os.path.join(subject_path, dir_name)


def generate_setup_name(modalities_cfg: Dict[str, Any]) -> str:
    """Readable + hashed setup name from the configured step list."""
    steps = []
    for mod_cfg in modalities_cfg.values():
        steps.extend(mod_cfg.get("preprocessing", {}).get("steps", []))
    readable_parts = [step["module"].split(".")[-1] for step in steps]
    readable_name = "__".join(readable_parts) if readable_parts else "raw"
    setup_str = "_".join(
        f"{step['module']}_{step.get('params', {})}" for step in steps
    )
    hash_part = hashlib.md5(setup_str.encode()).hexdigest()[:6]
    return f"{readable_name}_{hash_part}" if readable_parts else readable_name


def run(pipeline_params, io_params, io_module, preprocessor_module,
        modalities_cfg, devices=None):
    """``devices``: optional list of local devices — each block's step
    chain is dispatched to ``devices[i % n]`` (computation follows
    data), so an N-chip slice filters N blocks concurrently while the
    host loads ahead. Outputs are bitwise identical to the
    single-device run (the per-block computation is untouched; only its
    placement changes) — parity-tested in ``tests/test_preprocess.py``.

    The reference's hot loop runs every block's filters serially on one
    device (``/root/reference/preprocess/signal/frequency_filter.py:
    170-181``); this is the mesh-parallel redesign of SURVEY §7."""
    setup_name = generate_setup_name(modalities_cfg)
    setup_dir = os.path.join(io_params.output_dir, setup_name)
    os.makedirs(setup_dir, exist_ok=True)

    figures = getattr(pipeline_params, "figures", True)
    figure_root = os.path.join(setup_dir, "figures")
    if figures:
        os.makedirs(figure_root, exist_ok=True)

    with open(os.path.join(setup_dir, "config.yaml"), "w") as f:
        yaml.dump(
            {
                "preprocess": {
                    "pipeline": namespace_to_dict(pipeline_params),
                    "io": namespace_to_dict(io_params),
                    "modalities": modalities_cfg,
                }
            },
            f,
        )

    # Multi-host: each process preprocesses only its round-robin share of
    # blocks (host-level data sharding; a single process takes them all).
    from ...parallel.distributed import host_shard

    blocks = host_shard(
        list(
            iter_blocks(
                io_params.root_dir,
                pipeline_params.subject_dirs,
                getattr(pipeline_params, "subject_ids", None),
            )
        )
    )

    # Block saves run on a writer thread: save_block materializes the
    # device arrays (D2H) and writes npz — both overlap the NEXT block's
    # upload + compute (JAX dispatch is async; transfers are
    # thread-safe). One worker keeps write order; the 2-deep in-flight
    # bound caps device memory held by pending saves.
    from concurrent.futures import ThreadPoolExecutor

    # Custom preprocessor plugins may not accept the device kwarg.
    import inspect

    supports_device = "device" in inspect.signature(
        preprocessor_module.preprocess_modalities
    ).parameters
    # Demote for ANY devices list (even length 1 — e.g. a multi-process
    # mesh with one local chip per host) or the plugin crashes on the
    # unexpected kwarg.
    if devices is not None and not supports_device:
        print(
            "preprocessor plugin takes no `device` argument; "
            "preprocessing single-device"
        )
        devices = None
    n_dev = len(devices) if devices else 1

    pending = []
    with ThreadPoolExecutor(max_workers=1) as writer:
        for i, (subject_id, block_id, block_path) in enumerate(blocks):
            print(f"Processing block {block_id} of subject {subject_id}...")

            data_dict = io_module.load_block(block_path)

            block_params = dict_to_namespace(
                {
                    **{
                        k: v
                        for k, v in vars(io_params).items()
                        if k not in ("root_dir", "output_dir")
                    },
                    "block_id": block_id,
                    "subject_id": subject_id,
                }
            )

            block_figure_dir = None
            if figures:
                block_figure_dir = os.path.join(
                    figure_root, f"subject_{subject_id}", f"block_{block_id}"
                )
                os.makedirs(block_figure_dir, exist_ok=True)

            kwargs = {}
            if devices is not None:
                kwargs["device"] = devices[i % n_dev]
            preprocessor_module.preprocess_modalities(
                data_dict, modalities_cfg, block_params,
                figure_dir=block_figure_dir, **kwargs,
            )

            pending.append(
                writer.submit(
                    io_module.save_block, setup_dir, subject_id, block_id, data_dict
                )
            )
            # In-flight bound: with N devices the loop must run N blocks
            # ahead (plus one being written) to keep every chip busy.
            while len(pending) >= n_dev + 1:
                pending.pop(0).result()  # propagate writer errors early

        for future in pending:
            future.result()

    return setup_dir
