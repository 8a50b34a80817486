"""Classifier-training stage entry.

``run(config) -> log_dir``: flattens the io/experiment/training sections
plus dataset/model/evaluation into one params namespace, discovers
``subject_*.npz`` sample files, derives a hashed experiment log dir with
merged provenance config, draws the per-repeat seed list from the base
seed, and dispatches the separate/joint regime per subject. Mirrors
``/root/reference/train_classifier.py``.
"""

from __future__ import annotations

import os
import sys
from argparse import Namespace

import numpy as np
import yaml

from ..config import (
    dict_to_namespace,
    generate_hash_name_from_config,
    load_config,
)
from .classifier_pipeline import (
    save_and_plot_results,
    train_joint_targets,
    train_separate_targets,
)


def run(config: dict) -> str:
    print("Running train_classifier ...")

    training_section = config.get("training", {})
    train_cfg = training_section.get("params", {})
    flat_train = {}
    for section in ("io", "experiment", "training"):
        flat_train.update(train_cfg.get(section, {}) or {})
    model_cfg = config.get("model", {})
    dataset_cfg = config.get("dataset", {})
    evaluation_cfg = config.get("evaluation", {})

    combined_cfg = {**flat_train, **dataset_cfg, **model_cfg, **evaluation_cfg}
    # The evaluation section documents `metric_aggregates` as the
    # results.csv aggregate columns; the results writer reads
    # `aggregates` — alias it so the documented key is honored (the
    # evaluation stage performs the same rename).
    if "metric_aggregates" in combined_cfg and "aggregates" not in combined_cfg:
        combined_cfg["aggregates"] = combined_cfg["metric_aggregates"]
    params = dict_to_namespace(
        combined_cfg,
        # per_target: raw dict of per-target model overrides (nested
        # model_kwargs must stay plain for the factory)
        exclude_keys=["class_labels", "model_kwargs", "per_target"],
    )

    # Device parallelism from the top-level `parallel:` section (kept out
    # of combined_cfg: the mesh layout never changes results, so it must
    # not change the experiment hash).
    from ..parallel.mesh import mesh_from_config

    params.mesh = mesh_from_config(config.get("parallel"))
    if params.mesh is not None:
        print(f"training on mesh {dict(params.mesh.shape)}")

    sample_dir = getattr(params, "sample_dir", "data/samples")
    if not os.path.exists(sample_dir):
        raise FileNotFoundError(
            f"Sample directory {sample_dir} does not exist."
            "Please specify a valid sample_dir in the config."
        )

    subject_files = [
        f
        for f in sorted(os.listdir(sample_dir))
        if f.endswith(".npz") and f.startswith("subject_")
    ]
    if not subject_files:
        raise FileNotFoundError(
            f"No subject files found in {sample_dir}. "
            "Ensure files are named like 'subject_<id>.npz'."
        )

    if getattr(params, "model_name", None) is None and "model" in model_cfg:
        params.model_name = model_cfg["model"].split(".")[-1]

    base_log_dir = getattr(params, "log_dir", "logs")
    # Resume-control keys stay out of the experiment hash: a resumed run
    # must land in the SAME log dir as the fit it continues (and
    # checkpointing never changes results).
    hash_cfg = {
        k: v
        for k, v in combined_cfg.items()
        if k not in ("resume", "train_state_dir", "checkpoint_every")
    }
    exp_name = generate_hash_name_from_config(
        getattr(params, "model_name", "model"), config=hash_cfg
    )
    params.log_dir = os.path.join(base_log_dir, exp_name)
    os.makedirs(params.log_dir, exist_ok=True)

    # Merge upstream provenance configs into the experiment log dir.
    merged_cfg = {}
    for upstream in ("sample_dir", "channel_selection_dir"):
        upstream_dir = getattr(params, upstream, None)
        if upstream_dir:
            cfg_path = os.path.join(upstream_dir, "config.yaml")
            if os.path.exists(cfg_path):
                merged_cfg.update(load_config(cfg_path) or {})
    merged_cfg.update(
        {
            "model": model_cfg,
            "training": training_section,
            "dataset": dataset_cfg,
            "evaluation": evaluation_cfg,
        }
    )
    with open(os.path.join(params.log_dir, "config.yaml"), "w") as f:
        yaml.dump(merged_cfg, f)

    # Per-repeat seed stream drawn from the base seed (reference scheme:
    # np.random.randint(0, 10000, repeat); train_classifier.py:92-93 —
    # reproduced by utils.seeding.seed_stream without reseeding the
    # process-global RNG).
    from ..utils.seeding import seed_stream

    seeds = seed_stream(getattr(params, "seed", 42), getattr(params, "repeat", 1))

    subject_filter = _prepare_subject_filter(params, subject_files)

    # Multi-host: two regimes. WITHOUT a cross-host mesh, each process
    # trains its round-robin share of subjects independently (identity
    # under a single process). WITH a mesh spanning processes, every
    # process must launch the SAME computation in the same order
    # (multi-controller SPMD), so all processes run all subjects in
    # lockstep and non-zero ranks redirect file outputs to a scratch
    # subdir (rank 0's outputs are canonical).
    import jax

    from ..parallel.distributed import host_shard

    lockstep = params.mesh is not None and jax.process_count() > 1
    if lockstep:
        if jax.process_index() != 0:
            params.log_dir = os.path.join(
                params.log_dir, f".process{jax.process_index()}"
            )
            os.makedirs(params.log_dir, exist_ok=True)
    else:
        subject_files = host_shard(subject_files)

    for subject_file in subject_files:
        subject_id = subject_file.split("_")[1].split(".")[0]
        if subject_id not in subject_filter:
            continue

        print(f"--------- Processing file: {subject_file} ---------")
        subject_params = _prepare_subject_params(params, subject_id)

        if getattr(params, "separate_models", False):
            results, conf_mat, labels = train_separate_targets(subject_params, seeds)
        else:
            results, conf_mat, labels = train_joint_targets(subject_params, seeds)

        save_and_plot_results(subject_params, results, conf_mat, labels)

    _merge_process_results(params.log_dir)
    return params.log_dir


def _merge_process_results(log_dir: str) -> None:
    """Multi-host: fold per-process results shards into results.csv.

    Every process writes ``results.process<id>.csv`` during the subject
    loop (concurrent appends to one file can interleave mid-row); after a
    barrier, rank 0 appends all shards to the canonical ``results.csv``
    and removes them. No-op single-process."""
    import glob

    import jax

    from ..parallel.distributed import barrier

    if jax.process_count() <= 1:
        return
    barrier("train_classifier:results")
    if jax.process_index() != 0:
        return
    import pandas as pd

    shards = sorted(glob.glob(os.path.join(log_dir, "results.process*.csv")))
    if not shards:
        return
    merged = pd.concat([pd.read_csv(p) for p in shards], ignore_index=True)
    result_path = os.path.join(log_dir, "results.csv")
    if os.path.exists(result_path):
        merged.to_csv(result_path, mode="a", header=False, index=False)
    else:
        merged.to_csv(result_path, index=False)
    for p in shards:
        os.remove(p)
    print(f"Merged {len(shards)} process result shards into {result_path}")


def _prepare_subject_params(base_params: Namespace, subject_id: str) -> Namespace:
    subject_params = Namespace(**vars(base_params))
    subject_params.subject_id = subject_id
    subject_params.sample_path = os.path.join(
        base_params.sample_dir, f"subject_{subject_id}.npz"
    )
    channel_dir = getattr(base_params, "channel_selection_dir", None)
    if channel_dir:
        subject_params.channel_file = os.path.join(
            channel_dir, f"subject_{subject_id}.json"
        )
    return subject_params


def _prepare_subject_filter(params: Namespace, subject_files: list) -> list:
    subject_ids = getattr(params, "subject_ids", None)
    if subject_ids:
        return [str(s) for s in subject_ids]
    return [
        f.replace(".npz", "").replace("subject_", "")
        for f in subject_files
        if f.startswith("subject_")
    ]


if __name__ == "__main__":
    if len(sys.argv) != 2:
        raise SystemExit(
            "Usage: python -m decode_tonal_langauge_tpu.training.train_classifier <config.yaml>"
        )
    from ..runtime.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    run(load_config(sys.argv[1]))
