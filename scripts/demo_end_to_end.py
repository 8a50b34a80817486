#!/usr/bin/env python
"""Five-minute end-to-end demo: raw ECoG -> decoded labels -> speech.

Runs the WHOLE framework on a synthetic subject with light models, on
whatever backend JAX finds (a laptop CPU works):

    1. synthesize a raw subject (blocks + TextGrids)
    2. YAML pipeline: preprocess -> epochs -> channel selection ->
       per-target classifier training (logistic syllable + shallow-MLP
       tone via ``model.per_target``) -> frozen evaluation stage ->
       figures
    3. synthesizer CLI: SynthesisLite regresses mel spectrograms from
       non-discriminative channels + predicted label dynamics
    4. serving CLI: the training checkpoints + the synthesizer
       checkpoint decode the epochs to labels, mels, and Griffin-Lim
       waveforms in one jitted dispatch (classifier flags recovered
       from the training run via --training_dir)
    5. streaming serving: a continuous preprocessed block decoded as
       sliding windows (one batched dispatch) into per-window
       predictions + run-length events + mels + a WAV

Usage:
    python scripts/demo_end_to_end.py [workdir=demo_run]

For the measured-fastest real-model settings on a TPU, use
``configs/fast_bf16.yaml`` instead (see README / CONFIG.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Honor JAX_PLATFORMS through jax.config too: an injected platform
# plugin (sitecustomize) can register a backend that ignores the env
# var, and a dead tunneled backend then HANGS init.
from decode_tonal_langauge_tpu.runtime.platform import (  # noqa: E402
    honor_jax_platforms_env,
)

honor_jax_platforms_env()


def main() -> None:
    workdir = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "demo_run")
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    print(f"== demo workdir: {workdir}")

    from decode_tonal_langauge_tpu.data.synthetic import (
        SyntheticSpec,
        write_subject,
    )
    from decode_tonal_langauge_tpu.pipeline import run_pipeline

    print("== 1/5 generating a synthetic subject")
    spec = SyntheticSpec(
        n_channels=12,
        n_blocks=2,
        trials_per_block=48,
        ecog_sf=400.0,
        audio_sf=800.0,
        # 8-11: active but NOT discriminative — the synthesizer's input
        # set (active minus tone/syllable-discriminative) must be
        # non-empty
        active_channels=tuple(range(12)),
        tone_channels=(0, 1, 2, 3),
        syllable_channels=(4, 5, 6, 7),
    )
    write_subject("raw", 1, spec)

    print("== 2/5 running the YAML pipeline (per-target classifiers)")
    config = {
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
                    "params": {"root_dir": "raw", "output_dir": "processed"},
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
                                    "params": {
                                        "rereference_interval": [0.0, 5.0]
                                    },
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
                    "output_dir": "samples",
                    "textgrid_root": "raw",
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
                "io": {"output_dir": "channel_selection", "figures": False},
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
            # the per-target hook the paper's CNN+CNN-RNN pairing uses
            # (configs/fast_bf16.yaml); light models here so the demo
            # runs anywhere
            "per_target": {
                "tone": {
                    "model": "models.simple_classifiers.ShallowNNClassifier",
                    "model_kwargs": {"hidden_dim": 32},
                }
            },
        },
        "training": {
            "module": "train_classifier",
            "params": {
                "io": {"log_dir": "logs"},
                "experiment": {
                    "targets": ["syllable", "tone"],
                    "features": "ecog",
                    "separate_models": True,
                    "seed": 42,
                    "repeat": 2,
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
                    "save_checkpoints": True,
                },
            },
        },
        "evaluation": {
            "module": "evaluation_main",
            "metrics": ["accuracy", "f1_score", "confusion_matrix"],
            "metric_aggregates": ["mean", "std"],
        },
        "visualisation": {
            "module": "visualisation_main",
            "params": {
                "metrics": ["accuracy"],
                "chance_levels": {
                    "accuracy": {
                        "syllable, tone": 0.125,
                        "syllable": 0.5,
                        "tone": 0.25,
                    }
                },
            },
        },
    }
    outputs = run_pipeline(config)
    print(f"   training results: {outputs['training']}/results.csv")
    print(f"   frozen evaluation: {outputs['evaluation']}/results.csv")

    print("== 3/5 training the speech synthesizer (SynthesisLite)")
    synth_config = {
        "mel_kwargs": {"n_fft": 128, "hop_length": 64, "n_mels": 16},
        "tone_dynamic_mapping": {
            "0": [1.0, 1.0, 1.0],
            "1": [1.0, 2.0, 3.0],
            "2": [3.0, 2.0, 1.0],
            "3": [2.0, 1.0, 2.0],
        },
        "n_syllables": 2,
        "n_tones": 4,
    }
    with open("synth_config.json", "w") as f:
        json.dump(synth_config, f)

    from decode_tonal_langauge_tpu.training import train_synthesizer

    sample_npz = os.path.join(outputs["sample_collection"], "subject_1.npz")
    channel_json = os.path.join(
        outputs["channel_selection"], "subject_1.json"
    )
    synth_args = train_synthesizer.build_parser().parse_args(
        [
            "--sample_path", sample_npz,
            "--subject_id", "1",
            "--result_file", "synth/results.csv",
            "--figure_dir", "synth/figures",
            "--audio_dir", "synth/wavs",
            "--channel_file", channel_json,
            "--config_file", "synth_config.json",
            "--model_name", "demo_lite",
            "--synthesis_model_name", "SynthesisLite",
            "--syllable_model_name", "logistic",
            "--tone_model_name", "logistic",
            "--checkpoint_dir", "synth/ckpt",
            "--epochs", "30",
            "--batch_size", "16",
            "--audio_sampling_rate", "800",
            "--verbose", "0",
        ]
    )
    synth_summary = train_synthesizer.run(synth_args)
    print(
        f"   synthesis test MCD {synth_summary['mcd_mean']:.1f} dB, "
        f"mel Pearson r {synth_summary.get('mel_pearson_r_mean', float('nan')):.3f}"
    )

    print("== 4/5 serving: checkpoints decode the epochs to labels + speech")
    from decode_tonal_langauge_tpu import serving

    synth_ckpts = sorted(os.listdir("synth/ckpt"))
    serve_args = serving.build_parser().parse_args(
        [
            "--sample_path", sample_npz,
            "--training_dir", outputs["training"],
            "--config_file", "synth_config.json",
            "--synthesis_model_name", "SynthesisLite",
            "--synthesis_model_path", os.path.join("synth/ckpt", synth_ckpts[0]),
            "--audio_sampling_rate", "800",
            "--output_dir", "decoded",
            "--n_wavs", "2",
        ]
    )
    summary = serving.run(serve_args)
    print("   decoded/ holds predictions.csv, mels.npz, WAVs")

    print("== 5/5 streaming: sliding-window decode of a continuous block")
    block_npz = os.path.join(
        outputs["preprocess"], "subject_1", "B1_ecog.npz"
    )
    stream_args = serving.build_parser().parse_args(
        [
            "--stream_recording", block_npz,
            "--stream_window_s", "0.4",  # = the training sample_length
            "--stream_hop_s", "0.1",
            "--training_dir", outputs["training"],
            "--subject_id", "1",
            "--config_file", "synth_config.json",
            "--synthesis_model_name", "SynthesisLite",
            "--synthesis_model_path", os.path.join("synth/ckpt", synth_ckpts[0]),
            "--audio_sampling_rate", "800",
            "--output_dir", "streamed",
            "--n_wavs", "1",
        ]
    )
    stream_summary = serving.run(stream_args)
    print(
        f"   streamed/ holds windows.csv ({stream_summary['n_windows']} "
        f"windows), events.csv ({stream_summary['n_events']} events), "
        "mels, WAV"
    )
    print("== done")
    print(json.dumps({"epochs": summary, "stream": stream_summary}, indent=2))


if __name__ == "__main__":
    main()
