"""Full-pipeline integration test: synthetic raw recordings -> preprocess ->
sample collection -> channel selection -> classifier training, driven by
one YAML-shaped config through the pipeline runner (the reference's
``main.py`` usage)."""

import os

import numpy as np
import pandas as pd

from decode_tonal_langauge_tpu.data.synthetic import SyntheticSpec, write_subject
from decode_tonal_langauge_tpu.pipeline import run_pipeline


def _pipeline_config(tmp_path):
    return {
        "dataset": {
            "syllable_labels": ["mi", "ma"],
            "tone_labels": ["tone1", "tone2", "tone3", "tone4"],
        },
        "preprocess": {
            "module": "preprocess_main",
            "params": {
                "pipeline": {
                    "module": "preprocess.pipelines.subject_block",
                    "params": {
                        "subject_dirs": ["Sub1"],
                        "subject_ids": [1],
                        "figures": False,
                    },
                },
                "io": {
                    "module": "preprocess.io.npz_blocks",
                    "params": {
                        "root_dir": str(tmp_path / "raw"),
                        "output_dir": str(tmp_path / "processed"),
                    },
                },
                "preprocessor": {"module": "preprocess.preprocessor"},
                "modalities": {
                    "ecog": {
                        "type": "signal",
                        "preprocessing": {
                            "steps": [
                                {
                                    "module": "preprocess.frequency_filter",
                                    "params": {
                                        "bands": [
                                            {
                                                "method": "hilbert",
                                                "params": {
                                                    "freq_ranges": [70, 120],
                                                    "envelope": True,
                                                },
                                            }
                                        ]
                                    },
                                },
                                {
                                    "module": "preprocess.zscore_rereference",
                                    "params": {"rereference_interval": [0.0, 5.0]},
                                },
                            ]
                        },
                    },
                    "audio": {"type": "signal"},
                },
            },
        },
        "sample_collection": {
            "module": "extract_samples",
            "params": {
                "io": {
                    "output_dir": str(tmp_path / "samples"),
                    "textgrid_root": str(tmp_path / "raw"),
                    "figures": False,
                },
                "subjects": {
                    1: {
                        "start_offset": 0.1,
                        "sample_length": 0.4,
                        "rest_period": [0.0, 5.0],
                        "textgrid_dir": "annotations/subject_1",
                        "tier_list": ["success"],
                    }
                },
                "settings": {"syllable_identifiers": ["i", "a"]},
            },
        },
        "channel_selection": {
            "module": "channel_selection_main",
            "params": {
                "io": {
                    "output_dir": str(tmp_path / "selection"),
                    "figures": False,
                },
                "selections": [
                    {
                        "module": "channel_selection.active",
                        "selection_name": "active_channels",
                        "params": {
                            "p_threshold": 0.05,
                            "active_time_threshold": 0.05,
                            "rest_name": "ecog_rest",
                            "erp_name": "ecog",
                        },
                    },
                    {
                        "module": "channel_selection.discriminative",
                        "selection_name": "tone_discriminative",
                        "params": {
                            "p_threshold": 0.05,
                            "active_time_threshold": 0.05,
                            "label": "tone",
                            "recording_name": "ecog",
                        },
                    },
                    {
                        "module": "channel_selection.discriminative",
                        "selection_name": "syllable_discriminative",
                        "params": {
                            "p_threshold": 0.05,
                            "active_time_threshold": 0.05,
                            "label": "syllable",
                            "recording_name": "ecog",
                        },
                    },
                ],
            },
        },
        "model": {
            "model": "models.simple_classifiers.LogisticRegressionClassifier",
            "model_name": "logistic",
            "model_kwargs": {},
        },
        "training": {
            "module": "train_classifier",
            "params": {
                "io": {"log_dir": str(tmp_path / "logs")},
                "experiment": {
                    "targets": ["syllable", "tone"],
                    "features": "ecog",
                    "separate_models": True,
                    "seed": 42,
                    "repeat": 1,
                    "verbose": 0,
                    "subject_ids": None,
                },
                "training": {
                    "train_ratio": 0.7,
                    "vali_ratio": 0.1,
                    "test_ratio": 0.2,
                    "batch_size": 16,
                    "epochs": 60,
                    "lr": 0.0005,
                    "patience": 60,
                    "weight_decay": 0.01,
                    "standardize": True,
                },
            },
        },
        "evaluation": {
            # no `module`: stage is a no-op, its metrics/aggregates are
            # consumed by training (the reference contract). Tests that
            # exercise the shipped evaluation stage add the module +
            # save_checkpoints below.
            "metrics": ["accuracy", "f1_score", "confusion_matrix"],
            "metric_aggregates": ["mean", "std"],
        },
        "visualisation": {
            "module": "visualisation_main",
            "params": {
                "metrics": ["accuracy"],
                "chance_levels": {"accuracy": 0.125},
            },
        },
    }


def test_pipeline_deep_cnn(tmp_path):
    """The paper CNN (BASELINE.json config #3) through the YAML runner at
    tiny shapes: covers the deep-model path end-to-end."""
    spec = SyntheticSpec(
        n_channels=8,
        n_blocks=1,
        trials_per_block=16,
        ecog_sf=400.0,
        audio_sf=800.0,
        active_channels=tuple(range(8)),
        tone_channels=(0, 1, 2, 3),
        syllable_channels=(4, 5, 6, 7),
    )
    write_subject(str(tmp_path / "raw"), 1, spec)

    config = _pipeline_config(tmp_path)
    config["model"] = {
        "model": "models.deep_classifiers.CNNClassifier",
        "model_name": "cnn",
        "model_kwargs": {},
    }
    exp = config["training"]["params"]["experiment"]
    exp["targets"] = ["syllable"]
    tr = config["training"]["params"]["training"]
    # 1 epoch at tiny shapes: the paper CNN is heavy on the CPU test
    # backend; this covers the deep-model YAML path, not convergence
    tr["epochs"] = 1
    tr["patience"] = 1
    tr["batch_size"] = 8
    outputs = run_pipeline(config)

    results = pd.read_csv(os.path.join(outputs["training"], "results.csv"))
    assert (results["model_name"] == "cnn").all()
    # 2 epochs is a smoke test: assert the run completed and logged, not
    # that the deep model converged
    assert np.isfinite(results["accuracy_mean"]).all()


def test_pipeline_cnn_bf16_config(tmp_path):
    """`model_kwargs: {dtype: bfloat16}` in the YAML drives the bf16
    compute path through the whole training stage (the deliverable path,
    not a bench-only flag): run completes, metrics finite, and the
    results row records the bf16 model name."""
    spec = SyntheticSpec(
        n_channels=8,
        n_blocks=1,
        trials_per_block=16,
        ecog_sf=400.0,
        audio_sf=800.0,
        active_channels=tuple(range(8)),
        tone_channels=(0, 1, 2, 3),
        syllable_channels=(4, 5, 6, 7),
    )
    write_subject(str(tmp_path / "raw"), 1, spec)

    config = _pipeline_config(tmp_path)
    config["model"] = {
        "model": "models.deep_classifiers.CNNClassifier",
        "model_name": "cnn_bf16",
        "model_kwargs": {"dtype": "bfloat16"},
    }
    exp = config["training"]["params"]["experiment"]
    exp["targets"] = ["syllable"]
    # repeat > 1: the evaluation stage must reproduce EVERY seed's
    # metrics from the seed-parallel fit's checkpoints (regression for
    # the bf16-head tie bug — at repeat 1 the mismatch never surfaced)
    exp["repeat"] = 3
    tr = config["training"]["params"]["training"]
    tr["epochs"] = 2
    tr["patience"] = 2
    tr["batch_size"] = 8
    # also cover evaluation of a bf16 checkpoint (the provenance
    # model_kwargs dtype must reach the frozen predictor)
    tr["save_checkpoints"] = True
    config["evaluation"]["module"] = "evaluation_main"
    outputs = run_pipeline(config)

    results = pd.read_csv(os.path.join(outputs["training"], "results.csv"))
    assert (results["model_name"] == "cnn_bf16").all()
    assert np.isfinite(results["accuracy_mean"]).all()

    eval_results = pd.read_csv(
        os.path.join(outputs["evaluation"], "results.csv")
    )
    assert (
        eval_results["accuracy_all"] == results["accuracy_all"]
    ).all(), "bf16 evaluation diverged from the training-stage metrics"


def test_full_pipeline(tmp_path):
    spec = SyntheticSpec(
        n_channels=12,
        n_blocks=2,
        trials_per_block=48,
        ecog_sf=400.0,
        audio_sf=800.0,
        active_channels=tuple(range(8)),
        tone_channels=(0, 1, 2, 3),
        syllable_channels=(4, 5, 6, 7),
    )
    write_subject(str(tmp_path / "raw"), 1, spec)

    config = _pipeline_config(tmp_path)
    # Exercise the shipped evaluation stage: training checkpoints its
    # models, evaluation reloads them and must reproduce training's test
    # metrics without a gradient step.
    config["evaluation"]["module"] = "evaluation_main"
    # The documented key is metric_aggregates; the training stage must
    # honor it (aliased to the results-writer's `aggregates`)
    config["evaluation"]["metric_aggregates"] = ["mean", "std", "max"]
    config["training"]["params"]["training"]["save_checkpoints"] = True
    outputs = run_pipeline(config)

    # every stage produced an output dir and threaded it downstream
    for stage in ("preprocess", "sample_collection", "channel_selection", "training"):
        assert stage in outputs, f"stage {stage} produced no output"
        assert os.path.exists(outputs[stage])

    # sample npz exists with the expected schema
    samples = np.load(
        os.path.join(outputs["sample_collection"], "subject_1.npz")
    )
    n = 2 * spec.trials_per_block
    assert samples["ecog"].shape[0] == n
    assert samples["tone"].min() == 0

    # channel selection found the planted discriminative channels
    import json

    with open(os.path.join(outputs["channel_selection"], "subject_1.json")) as f:
        sel = json.load(f)
    assert len(sel["active_channels"]) > 0
    assert set(sel["tone_discriminative"]) & {0, 1, 2, 3}
    assert set(sel["syllable_discriminative"]) & {4, 5, 6, 7}

    # training wrote results.csv with joint + per-target rows
    results = pd.read_csv(os.path.join(outputs["training"], "results.csv"))
    assert len(results) == 3  # joint + syllable + tone
    # the documented metric_aggregates key drove the aggregate columns
    assert "accuracy_max" in results.columns
    joint = results.iloc[0]
    assert joint["target"] == "syllable, tone"
    # the synthetic labels are linearly decodable from the planted channels
    per_target = results.set_index("target")
    assert per_target.loc["syllable", "accuracy_mean"] > 0.65
    assert os.path.exists(
        os.path.join(outputs["training"], "figures/subject_1/confusion_matrix.png")
    )
    assert os.path.exists(os.path.join(outputs["training"], "config.yaml"))

    # evaluation stage: frozen re-evaluation reproduces training's test
    # metrics exactly (same checkpoints, same split_indices seed stream)
    assert "evaluation" in outputs
    eval_results = pd.read_csv(os.path.join(outputs["evaluation"], "results.csv"))
    assert len(eval_results) == 3  # joint + syllable + tone
    train_by_target = results.set_index("target")
    eval_by_target = eval_results.set_index("target")
    for target in ("syllable, tone", "syllable", "tone"):
        assert eval_by_target.loc[target, "accuracy_all"] == (
            train_by_target.loc[target, "accuracy_all"]
        ), f"evaluation diverged from training on {target}"
    assert os.path.exists(
        os.path.join(
            outputs["evaluation"], "figures/subject_1/confusion_matrix.png"
        )
    )

    # visualisation stage consumed the training + selection outputs
    assert "visualisation" in outputs
    assert os.path.exists(
        os.path.join(outputs["visualisation"], "accuracy_by_subject.png")
    )
    assert os.path.exists(
        os.path.join(outputs["visualisation"], "subject_1_channel_venn.png")
    )


def test_pipeline_per_target_models(tmp_path):
    """`model.per_target` pairs a different architecture per target in ONE
    run (the paper's CNN-syllable + CNN-RNN-tone combination; the
    reference needs one run per architecture): per-target rows carry
    their own model_name, checkpoints key by it, and the evaluation
    stage recovers the same overrides from provenance so the frozen
    re-evaluation reproduces training's metrics exactly."""
    spec = SyntheticSpec(
        n_channels=8,
        n_blocks=1,
        trials_per_block=24,
        ecog_sf=400.0,
        audio_sf=800.0,
        active_channels=tuple(range(8)),
        tone_channels=(0, 1, 2, 3),
        syllable_channels=(4, 5, 6, 7),
    )
    write_subject(str(tmp_path / "raw"), 1, spec)

    config = _pipeline_config(tmp_path)
    config["model"] = {
        "model": "models.simple_classifiers.LogisticRegressionClassifier",
        "model_name": "logistic",
        "model_kwargs": {},
        "per_target": {
            "tone": {
                "model": "models.simple_classifiers.ShallowNNClassifier",
                "model_kwargs": {"hidden_dim": 16},
            },
        },
    }
    exp = config["training"]["params"]["experiment"]
    exp["repeat"] = 2
    tr = config["training"]["params"]["training"]
    tr["save_checkpoints"] = True
    config["evaluation"]["module"] = "evaluation_main"
    outputs = run_pipeline(config)

    results = pd.read_csv(os.path.join(outputs["training"], "results.csv"))
    by_target = results.set_index("target")
    assert by_target.loc["syllable", "model_name"] == "logistic"
    assert by_target.loc["tone", "model_name"] == "ShallowNNClassifier"
    assert by_target.loc["syllable, tone", "model_name"] == "logistic"

    # checkpoints key by the per-target model name
    ckpts = os.listdir(os.path.join(outputs["training"], "model_checkpoints"))
    assert any(c.startswith("tone_ShallowNNClassifier_subject_1_seed_") for c in ckpts)
    assert any(c.startswith("syllable_logistic_subject_1_seed_") for c in ckpts)

    # the evaluation stage reproduces every (target, seed) metric exactly
    eval_results = pd.read_csv(
        os.path.join(outputs["evaluation"], "results.csv")
    ).set_index("target")
    for target in ("syllable, tone", "syllable", "tone"):
        assert eval_results.loc[target, "accuracy_all"] == (
            by_target.loc[target, "accuracy_all"]
        ), f"evaluation diverged from training on {target}"
        assert eval_results.loc[target, "model_name"] == (
            by_target.loc[target, "model_name"]
        )

    # serving --training_dir: the per-target models, kwargs, checkpoint
    # paths, and channel file are recovered from the run's provenance —
    # no model flags needed.
    from decode_tonal_langauge_tpu.serving import build_parser, run

    served = str(tmp_path / "served")
    summary = run(
        build_parser().parse_args(
            [
                "--sample_path",
                os.path.join(outputs["sample_collection"], "subject_1.npz"),
                "--training_dir",
                outputs["training"],
                "--output_dir",
                served,
                "--n_wavs",
                "0",
            ]
        )
    )
    assert summary["n_trials"] == 24
    assert 0.0 <= summary["tone_accuracy"] <= 1.0
    assert 0.0 <= summary["syllable_accuracy"] <= 1.0
    assert os.path.exists(os.path.join(served, "predictions.csv"))

    # a seed outside the run's stream is rejected
    import pytest

    with pytest.raises(ValueError, match="seed stream"):
        run(
            build_parser().parse_args(
                [
                    "--sample_path",
                    os.path.join(
                        outputs["sample_collection"], "subject_1.npz"
                    ),
                    "--training_dir",
                    outputs["training"],
                    "--output_dir",
                    served,
                    "--seed",
                    "1",
                ]
            )
        )
