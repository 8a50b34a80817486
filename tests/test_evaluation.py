"""Evaluation-stage tests: frozen re-evaluation must reproduce the
training stage's test metrics exactly — across the sequential AND
seed-parallel trainer paths, joint and separate regimes — plus the
stage's error modes. (The full-pipeline wiring is covered in
``test_pipeline_e2e.py::test_full_pipeline``.)"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from decode_tonal_langauge_tpu.evaluation import main as evaluation_main
from decode_tonal_langauge_tpu.training import train_classifier


def _make_samples(tmp_path, n=64):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((n, 6, 10)).astype(np.float32)
    syll = np.tile([0, 1], n // 2)
    tone = np.tile([0, 1, 2, 3], n // 4)
    x[syll == 1, :3] += 4.0
    x[tone == 2, 3:] += 3.0
    sample_dir = tmp_path / "samples"
    sample_dir.mkdir(parents=True)
    np.savez(
        sample_dir / "subject_1.npz",
        ecog=x, ecog_sf=100.0, syllable=syll, tone=tone,
    )
    return str(sample_dir)


def _make_channels(tmp_path):
    sel_dir = tmp_path / "selection"
    sel_dir.mkdir(parents=True)
    with open(sel_dir / "subject_1.json", "w") as f:
        json.dump(
            {
                "syllable_discriminative": [0, 1, 2],
                "tone_discriminative": [3, 4, 5],
            },
            f,
        )
    return str(sel_dir)


def _train_config(tmp_path, sample_dir, repeat, separate,
                  channel_dir=None, targets=("syllable",)):
    io = {
        "log_dir": str(tmp_path / "logs"),
        "sample_dir": sample_dir,
    }
    if channel_dir:
        io["channel_selection_dir"] = channel_dir
    return {
        "model": {
            "model": "models.simple_classifiers.LogisticRegressionClassifier",
            "model_name": "logistic",
            "model_kwargs": {},
        },
        "training": {
            "module": "train_classifier",
            "params": {
                "io": io,
                "experiment": {
                    "targets": list(targets),
                    "features": "ecog",
                    "separate_models": separate,
                    "seed": 42,
                    "repeat": repeat,
                    "verbose": 0,
                },
                "training": {
                    "train_ratio": 0.6,
                    "vali_ratio": 0.2,
                    "test_ratio": 0.2,
                    "batch_size": 8,
                    "epochs": 20,
                    "lr": 0.01,
                    "standardize": True,
                    "patience": 20,
                    "save_checkpoints": True,
                },
            },
        },
        "evaluation": {"metrics": ["accuracy", "f1_score"]},
    }


def _run_eval(training_dir, sample_dir, channel_dir=None, eval_extra=None):
    eval_cfg = {
        "module": "evaluation_main",
        "params": {
            "io": {
                "training_dir": training_dir,
                "sample_dir": sample_dir,
                **(
                    {"channel_selection_dir": channel_dir}
                    if channel_dir
                    else {}
                ),
            }
        },
        **(eval_extra or {}),
    }
    return evaluation_main.run({"evaluation": eval_cfg})


def _assert_rows_match(training_dir, eval_dir):
    tr = pd.read_csv(os.path.join(training_dir, "results.csv")).set_index(
        "target"
    )
    ev = pd.read_csv(os.path.join(eval_dir, "results.csv")).set_index(
        "target"
    )
    assert set(ev.index) == set(tr.index)
    for target in tr.index:
        assert ev.loc[target, "accuracy_all"] == tr.loc[target, "accuracy_all"], (
            f"evaluation diverged from training on {target}"
        )


def test_eval_matches_seed_parallel_training(tmp_path):
    """repeat=3 takes the vmapped seed-parallel trainer; evaluation's
    per-seed frozen reload must still land on identical test metrics."""
    sample_dir = _make_samples(tmp_path)
    cfg = _train_config(tmp_path, sample_dir, repeat=3, separate=False)
    training_dir = train_classifier.run(cfg)
    eval_dir = _run_eval(training_dir, sample_dir)
    _assert_rows_match(training_dir, eval_dir)


def test_eval_matches_separate_targets_with_channels(tmp_path):
    """Separate regime: per-target channel subsets + joint mixed-radix
    row all reproduce."""
    sample_dir = _make_samples(tmp_path)
    channel_dir = _make_channels(tmp_path)
    cfg = _train_config(
        tmp_path, sample_dir, repeat=2, separate=True,
        channel_dir=channel_dir, targets=("syllable", "tone"),
    )
    training_dir = train_classifier.run(cfg)
    eval_dir = _run_eval(training_dir, sample_dir, channel_dir)
    _assert_rows_match(training_dir, eval_dir)


def test_eval_multi_subject_resolves_each_subjects_model(tmp_path):
    """Two subjects with DIFFERENT planted structure: checkpoints are
    keyed by subject (checkpoint_name), so evaluation must reproduce
    each subject's own training metrics — the regression here was a
    subject-less checkpoint path, where subject 2's training overwrote
    subject 1's weights and evaluation silently scored subject 1 with
    subject 2's model."""
    rng = np.random.default_rng(7)
    sample_dir = tmp_path / "samples"
    sample_dir.mkdir(parents=True)
    n = 64
    syll = np.tile([0, 1], n // 2)
    tone = np.tile([0, 1, 2, 3], n // 4)
    for sid, cols, sign in ((1, slice(0, 3), +4.0), (2, slice(3, 6), -4.0)):
        x = rng.standard_normal((n, 6, 10)).astype(np.float32)
        # Subject 2's discriminative channels AND direction differ, so
        # the two trained models are genuinely different functions.
        x[syll == 1, cols] += sign
        np.savez(
            sample_dir / f"subject_{sid}.npz",
            ecog=x, ecog_sf=100.0, syllable=syll, tone=tone,
        )
    cfg = _train_config(tmp_path, str(sample_dir), repeat=2, separate=False)
    training_dir = train_classifier.run(cfg)

    ckpts = sorted(
        os.listdir(os.path.join(training_dir, "model_checkpoints"))
    )
    assert any("subject_1" in c for c in ckpts)
    assert any("subject_2" in c for c in ckpts)

    eval_dir = _run_eval(training_dir, str(sample_dir))
    tr = pd.read_csv(os.path.join(training_dir, "results.csv"))
    ev = pd.read_csv(os.path.join(eval_dir, "results.csv"))
    assert sorted(ev["subject"].tolist()) == sorted(tr["subject"].tolist())
    for _, row in tr.iterrows():
        match = ev[ev["subject"] == row["subject"]]
        assert len(match) == 1
        assert match.iloc[0]["accuracy_all"] == row["accuracy_all"], (
            f"evaluation diverged from training for subject {row['subject']}"
        )


def test_eval_own_metrics_override(tmp_path):
    """The evaluation section's metric list wins over the training-time
    metrics — post-hoc evaluation of extra metrics."""
    sample_dir = _make_samples(tmp_path)
    cfg = _train_config(tmp_path, sample_dir, repeat=1, separate=False)
    training_dir = train_classifier.run(cfg)
    eval_dir = _run_eval(
        training_dir, sample_dir,
        eval_extra={
            "metrics": ["accuracy", "precision", "recall"],
            "metric_aggregates": ["mean", "max"],
        },
    )
    ev = pd.read_csv(os.path.join(eval_dir, "results.csv"))
    for col in ("precision_mean", "recall_max", "accuracy_mean"):
        assert col in ev.columns
        assert np.isfinite(ev[col]).all()


def test_eval_requires_checkpoints(tmp_path):
    """Training without save_checkpoints -> clear error naming the fix."""
    sample_dir = _make_samples(tmp_path)
    cfg = _train_config(tmp_path, sample_dir, repeat=1, separate=False)
    del cfg["training"]["params"]["training"]["save_checkpoints"]
    training_dir = train_classifier.run(cfg)
    with pytest.raises(FileNotFoundError, match="save_checkpoints"):
        _run_eval(training_dir, sample_dir)


def test_eval_requires_training_dir():
    with pytest.raises(ValueError, match="training_dir"):
        evaluation_main.run({"evaluation": {"params": {"io": {}}}})


def test_eval_joint_head_size_from_checkpoint_not_eval_data(tmp_path):
    """Joint regime evaluated on a SUBSET missing one combined class
    (ADVICE r4): the joint head must be rebuilt at the checkpoint's size
    (head-bias length), not len(np.unique(labels)) of the evaluated data
    — the smaller rebuilt head otherwise fails the frozen reload."""
    sample_dir = _make_samples(tmp_path)
    cfg = _train_config(
        tmp_path, sample_dir, repeat=1, separate=False,
        targets=("syllable", "tone"),
    )
    training_dir = train_classifier.run(cfg)

    full = np.load(os.path.join(sample_dir, "subject_1.npz"))
    keep = ~((full["syllable"] == 1) & (full["tone"] == 3))
    assert keep.sum() < full["syllable"].shape[0]  # a class truly vanished
    subset_dir = tmp_path / "samples_subset"
    subset_dir.mkdir()
    np.savez(
        subset_dir / "subject_1.npz",
        ecog=full["ecog"][keep],
        ecog_sf=100.0,
        syllable=full["syllable"][keep],
        tone=full["tone"][keep],
    )

    eval_dir = _run_eval(training_dir, str(subset_dir))
    ev = pd.read_csv(os.path.join(eval_dir, "results.csv"))
    assert np.isfinite(ev["accuracy_mean"]).all()


def test_eval_joint_radix_pinned_to_training_label_space(tmp_path):
    """Eval subset missing an ENTIRE first-target class: the mixed-radix
    combine multiplies later targets by the EARLIER targets' class
    counts, so deriving counts from the evaluated data (tone 4 -> 3)
    re-encodes every combined label and silently mismatches the
    checkpoint's classes. Training records its label space
    (n_classes_subject_<id>.json) and evaluation must pin to it."""
    rng = np.random.default_rng(3)
    n = 96
    x = rng.standard_normal((n, 6, 10)).astype(np.float32) * 0.1
    # independent targets (np.tile for BOTH would make syllable = tone % 2,
    # collapsing the joint label space to 4 of 8 classes)
    tone = np.repeat([0, 1, 2, 3], n // 4)
    syll = np.tile([0, 1], n // 2)
    for t in range(4):  # every class strongly decodable
        x[tone == t, t] += 5.0
    x[syll == 1, 4] += 5.0
    sample_dir = tmp_path / "samples"
    sample_dir.mkdir(parents=True)
    np.savez(
        sample_dir / "subject_1.npz",
        ecog=x, ecog_sf=100.0, tone=tone, syllable=syll,
    )

    cfg = _train_config(
        tmp_path, str(sample_dir), repeat=1, separate=False,
        targets=("tone", "syllable"),
    )
    # the 8-class joint head needs more steps than the harness default
    cfg["training"]["params"]["training"]["epochs"] = 100
    cfg["training"]["params"]["training"]["patience"] = 100
    training_dir = train_classifier.run(cfg)
    assert os.path.exists(
        os.path.join(training_dir, "n_classes_subject_1.json")
    ), "training did not record its label space"
    tr = pd.read_csv(os.path.join(training_dir, "results.csv"))
    assert tr["accuracy_mean"].iloc[0] > 0.9  # the task is easy by design

    keep = tone != 3  # a whole tone class vanishes from the eval subset
    subset_dir = tmp_path / "samples_subset"
    subset_dir.mkdir()
    np.savez(
        subset_dir / "subject_1.npz",
        ecog=x[keep], ecog_sf=100.0, tone=tone[keep], syllable=syll[keep],
    )

    eval_dir = _run_eval(training_dir, str(subset_dir))
    ev = pd.read_csv(os.path.join(eval_dir, "results.csv"))
    # wrong radix scrambles labels vs predictions -> accuracy craters;
    # pinned radix keeps the easy task near ceiling
    assert ev["accuracy_mean"].iloc[0] > 0.9, ev["accuracy_mean"].iloc[0]
