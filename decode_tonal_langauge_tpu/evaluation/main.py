"""Evaluation stage: checkpoints + samples -> test metrics, no retraining.

The reference lists ``evaluation`` in its stage order but never ships the
module (``/root/reference/main.py:8-15`` — its evaluation params are
consumed by the training stage instead). This module finishes the stage:
point it at a completed training run (``save_checkpoints: true``) and it
reproduces every (target, seed) test split, loads the checkpointed frozen
models, predicts the held-out trials in one jitted pass per model, and
writes the same ``results.csv`` schema + confusion artifacts the training
stage produces — without a single gradient step.

Config::

    evaluation:
      module: evaluation_main        # omit to keep the reference no-op
      metrics: [accuracy, f1_score, confusion_matrix]
      metric_aggregates: [mean, std]
      params:
        io:
          training_dir: <training stage output>   # threaded by the runner
          sample_dir: <sample_collection output>  # threaded
          channel_selection_dir: <...>            # threaded
          output_dir: <explicit override>         # default training_dir/evaluation

Everything else — model class/kwargs, targets, split ratios, base seed,
repeat count, standardisation — is recovered from the training run's
provenance ``config.yaml``, so evaluation can never drift from what was
trained. Split reproduction uses the same ``split_indices`` + seed stream
as training; the checkpointed train-split scaler is re-applied before
prediction.
"""

from __future__ import annotations

import os
from argparse import Namespace
from typing import Any, Dict, List, Optional

import numpy as np

from ..config import (
    flatten_training_provenance,
    load_config,
    namespace_training_params,
)
from ..data.sample_loading import ClassificationSampleHandler
from ..data.splits import split_indices
from ..models.factory import get_classifier_by_name
from ..utils.metrics import (
    compute_classification_metrics,
    compute_classification_metrics_joint,
)


def _load_training_provenance(training_dir: str) -> Dict[str, Any]:
    cfg_path = os.path.join(training_dir, "config.yaml")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(
            f"No config.yaml in {training_dir} — evaluation needs the "
            "training stage's provenance config to reproduce its splits."
        )
    return load_config(cfg_path) or {}


class _FrozenPredictor:
    """One jitted argmax-predict per model architecture (batched)."""

    def __init__(self, model):
        import jax

        self.model = model

        @jax.jit
        def _predict(variables, x):
            import jax.numpy as jnp

            logits = model.apply(variables, x, train=False)
            return jnp.argmax(logits, axis=-1)

        self._predict = _predict

    def __call__(self, variables, x: np.ndarray) -> np.ndarray:
        return np.asarray(self._predict(variables, x))


def _predict_target_seed(
    params: Namespace,
    features: np.ndarray,
    labels: np.ndarray,
    n_classes: int,
    target_str: str,
    seed: int,
    predictor_cache: Dict[str, _FrozenPredictor],
    restored_cache: Optional[Dict[str, dict]] = None,
):
    """Reproduce one (target, seed) test split and predict it frozen."""
    from ..runtime.checkpoint import load_params
    from ..training.classifier_pipeline import checkpoint_name

    # checkpoint_name is the SAME helper the training stage saves with,
    # so the (subject, target, model, seed) keying can never drift —
    # multi-subject runs each resolve their own subject's weights.
    ckpt = os.path.join(
        params.training_dir,
        "model_checkpoints",
        checkpoint_name(params, target_str, seed),
    )
    if not os.path.exists(ckpt):
        raise FileNotFoundError(
            f"Checkpoint {ckpt} not found — run the training stage with "
            "save_checkpoints: true before the evaluation stage."
        )
    # the head-size probe may have restored this checkpoint already
    restored = restored_cache.pop(ckpt, None) if restored_cache else None
    if restored is None:
        restored = dict(load_params(ckpt))
    scaler = restored.pop("scaler", None)
    n_params = sum(
        int(np.size(leaf))
        for leaf in _tree_leaves(restored.get("params", restored))
    )
    if scaler is not None:
        features = (features - np.asarray(scaler["mu"])) / np.asarray(
            scaler["sd"]
        )

    _, _, te_idx = split_indices(
        features.shape[0],
        [params.train_ratio, params.vali_ratio, params.test_ratio],
        seed=seed,
    )

    cache_key = f"{target_str}:{features.shape[1]}x{features.shape[2]}"
    if cache_key not in predictor_cache:
        model = get_classifier_by_name(
            params.model,
            n_classes=n_classes,
            n_channels=features.shape[1],
            seq_length=features.shape[2],
            classifier_kwargs=getattr(params, "model_kwargs", {}) or {},
        )
        predictor_cache[cache_key] = _FrozenPredictor(model)

    preds = predictor_cache[cache_key](
        restored, features[te_idx].astype(np.float32)
    )
    return labels[te_idx], preds, n_params


def _tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def _n_classes_from_checkpoint(
    params: Namespace,
    target_str: str,
    seed: int,
    restored_cache: Optional[Dict[str, dict]] = None,
) -> Optional[int]:
    """Class-head size from the trained checkpoint's own bias shape.

    Mirrors serving's ``_mel_dim_from_variables``: every shipped
    classifier ends in a Dense head (``linear`` / ``output`` / ``fc2`` /
    ``head``) whose bias length IS ``n_classes``. Returns None (caller
    falls back to the eval-data-derived count) for missing checkpoints
    or custom architectures without a known head name. The restored tree
    is parked in ``restored_cache`` so the seed loop's own restore of the
    same checkpoint is free."""
    from ..runtime.checkpoint import load_params
    from ..training.classifier_pipeline import checkpoint_name

    ckpt = os.path.join(
        params.training_dir,
        "model_checkpoints",
        checkpoint_name(params, target_str, seed),
    )
    if not os.path.exists(ckpt):
        return None
    restored = dict(load_params(ckpt))
    if restored_cache is not None:
        restored_cache[ckpt] = restored
    tree = restored.get("params", restored)
    for head in ("linear", "output", "fc2", "head"):
        if head in tree and "bias" in tree[head]:
            return int(np.asarray(tree[head]["bias"]).shape[0])
    return None


def _evaluate_subject(params: Namespace, seeds: np.ndarray) -> None:
    """All (target, seed) evaluations of one subject -> results.csv rows."""
    from ..training.classifier_pipeline import (
        save_and_plot_results,
        target_model_params,
    )

    metrics = getattr(params, "metrics", ["accuracy"])
    separate = bool(getattr(params, "separate_models", False))
    predictor_cache: Dict[str, _FrozenPredictor] = {}

    # Pin the label space to the TRAINING run's recorded per-target
    # counts (classifier_pipeline.record_label_space): deriving counts
    # from the evaluated data re-encodes the mixed-radix labels and
    # shrinks heads whenever a class is absent from the evaluated subset.
    import json

    label_space_path = os.path.join(
        params.training_dir, f"n_classes_subject_{params.subject_id}.json"
    )
    if os.path.exists(label_space_path):
        with open(label_space_path) as f:
            params.expected_n_classes = json.load(f)

    if separate:
        per_target: Dict[str, dict] = {}
        channels: Dict[str, List[int]] = {}
        n_classes_dict: Dict[str, int] = {}
        individual_class_labels: Dict[str, List[str]] = {}
        for target in params.targets:
            tp = Namespace(**vars(params))
            tp.targets = [target]
            handler = ClassificationSampleHandler(tp)
            data = handler.load_data()
            per_target[target] = data
            channels[target] = [int(c) for c in data["selected_channels"]]
            n_classes_dict[target] = data["n_classes_dict"][target]
            individual_class_labels[target] = handler.prepare_class_labels(
                {target: data["n_classes_dict"][target]}
            )
        class_labels = ClassificationSampleHandler(params).prepare_class_labels(
            n_classes_dict
        )
        n_classes = int(np.prod(list(n_classes_dict.values())))
    else:
        handler = ClassificationSampleHandler(params)
        data = handler.load_data()
        # Joint head size comes from the CHECKPOINT, not the eval-time
        # data (ADVICE r4): len(np.unique(labels)) undercounts whenever a
        # combined class is absent from the evaluated subset, and the
        # rebuilt head would then be smaller than the checkpointed one.
        joint_name = (
            "_".join(params.targets)
            if len(params.targets) > 1
            else params.targets[0]
        )
        restored_cache: Dict[str, dict] = {}
        n_classes = _n_classes_from_checkpoint(
            params, joint_name, int(seeds[0]), restored_cache
        ) or len(np.unique(data["labels"]))
        class_labels = handler.prepare_class_labels(data["n_classes_dict"])

    metric_values: Dict[str, List[float]] = {
        m: [] for m in metrics if m != "confusion_matrix"
    }
    confusion_mat = (
        np.zeros((n_classes, n_classes))
        if "confusion_matrix" in metrics
        else None
    )
    individual_metrics = (
        {
            t: {m: [] for m in metrics if m != "confusion_matrix"}
            for t in params.targets
        }
        if separate
        else {}
    )
    individual_confusion_mat = (
        {
            t: np.zeros((n_classes_dict[t], n_classes_dict[t]))
            for t in params.targets
        }
        if separate and "confusion_matrix" in metrics
        else None
    )
    model_size = 0

    for seed in seeds:
        if separate:
            all_true: Dict[str, np.ndarray] = {}
            all_preds: Dict[str, np.ndarray] = {}
            for target in params.targets:
                data = per_target[target]
                # model.per_target: the same override the training stage
                # applied, recovered from provenance — checkpoint names
                # and architectures must match per target.
                true, preds, n_params = _predict_target_seed(
                    target_model_params(params, target),
                    data["features"].astype(np.float32),
                    data["labels"].astype(np.int32),
                    n_classes_dict[target],
                    target,
                    int(seed),
                    predictor_cache,
                )
                all_true[target] = true
                all_preds[target] = preds
                model_size += n_params
                tm = compute_classification_metrics(true, preds, metrics=metrics)
                for m in metric_values:
                    individual_metrics[target][m].append(tm[m])
                if (
                    individual_confusion_mat is not None
                    and "confusion_matrix" in tm
                ):
                    cm = tm["confusion_matrix"]
                    full = individual_confusion_mat[target]
                    full[: cm.shape[0], : cm.shape[1]] += cm
            jm = compute_classification_metrics_joint(
                all_true, all_preds, metrics=metrics
            )
        else:
            true, preds, n_params = _predict_target_seed(
                params,
                data["features"].astype(np.float32),
                data["labels"].astype(np.int32),
                n_classes,
                joint_name,
                int(seed),
                predictor_cache,
                restored_cache,
            )
            model_size = n_params
            jm = compute_classification_metrics(true, preds, metrics=metrics)
        for m in metric_values:
            metric_values[m].append(jm[m])
        if confusion_mat is not None and "confusion_matrix" in jm:
            cm = jm["confusion_matrix"]
            confusion_mat[: cm.shape[0], : cm.shape[1]] += cm

    result_info = {
        **metric_values,
        "model_size": model_size,
        "channels": channels if separate else
        [int(c) for c in data["selected_channels"]],
        "seeds": np.asarray(seeds).tolist(),
        "class_labels": class_labels,
    }
    if separate:
        result_info["individual_metrics"] = individual_metrics
        result_info["individual_confusion_matrix"] = individual_confusion_mat
        result_info["individual_class_labels"] = individual_class_labels
        result_info["individual_model_names"] = {
            t: target_model_params(params, t).model_name
            for t in params.targets
        }

    save_and_plot_results(params, result_info, confusion_mat, class_labels)


def run(config: dict) -> str:
    print("Running evaluation ...")
    eval_section = config.get("evaluation", {}) or {}
    eval_params = eval_section.get("params", {}) or {}
    io_cfg = dict(eval_params.get("io", {}) or {})

    training_dir = io_cfg.get("training_dir")
    if not training_dir:
        raise ValueError(
            "evaluation.params.io.training_dir is required (the pipeline "
            "runner threads it from the training stage automatically)."
        )
    provenance = _load_training_provenance(training_dir)

    # Flatten the training run's provenance exactly like train_classifier
    # does (shared helper: config.flatten_training_provenance), so
    # splits/model/seeds reproduce bit-for-bit.
    flat = flatten_training_provenance(provenance)
    # metrics/aggregates: the evaluation stage's own section wins over the
    # training-time values, so users can evaluate extra metrics post hoc.
    flat.update(provenance.get("evaluation", {}) or {})
    for key in ("metrics", "metric_aggregates", "aggregates"):
        if key in eval_section:
            flat[key] = eval_section[key]
    if "metric_aggregates" in flat and "aggregates" not in flat:
        flat["aggregates"] = flat.pop("metric_aggregates")

    params = namespace_training_params(flat)
    params.training_dir = training_dir

    # io threading: explicit evaluation io wins; fall back to the dirs the
    # training run recorded in its provenance.
    sample_dir = io_cfg.get("sample_dir") or getattr(params, "sample_dir", None)
    channel_dir = io_cfg.get("channel_selection_dir") or getattr(
        params, "channel_selection_dir", None
    )
    if not sample_dir or not os.path.exists(sample_dir):
        raise FileNotFoundError(
            f"Sample directory {sample_dir!r} does not exist — set "
            "evaluation.params.io.sample_dir or run sample_collection first."
        )
    params.log_dir = io_cfg.get("output_dir") or os.path.join(
        training_dir, "evaluation"
    )
    os.makedirs(params.log_dir, exist_ok=True)

    # Same per-repeat seed stream as training (train_classifier.run).
    from ..utils.seeding import seed_stream

    seeds = seed_stream(getattr(params, "seed", 42), getattr(params, "repeat", 1))

    subject_files = [
        f
        for f in sorted(os.listdir(sample_dir))
        if f.endswith(".npz") and f.startswith("subject_")
    ]
    subject_ids = getattr(params, "subject_ids", None)
    allowed = (
        {str(s) for s in subject_ids} if subject_ids else None
    )

    from ..parallel.distributed import host_shard

    for subject_file in host_shard(subject_files):
        subject_id = subject_file.split("_")[1].split(".")[0]
        if allowed is not None and subject_id not in allowed:
            continue
        print(f"--------- Evaluating subject: {subject_id} ---------")
        sp = Namespace(**vars(params))
        sp.subject_id = subject_id
        sp.sample_path = os.path.join(sample_dir, subject_file)
        if channel_dir:
            sp.channel_file = os.path.join(
                channel_dir, f"subject_{subject_id}.json"
            )
        _evaluate_subject(sp, seeds)

    # Multi-host: fold per-process results.process<k>.csv shards into the
    # canonical results.csv (save_and_plot_results writes shards whenever
    # jax.process_count() > 1; no-op single-process).
    from ..training.train_classifier import _merge_process_results

    _merge_process_results(params.log_dir)
    return params.log_dir
