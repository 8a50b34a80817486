"""Synthesizer training CLI.

Argparse-driven entry with the reference's flag surface and outputs
(``/root/reference/train_synthesizer.py``): channel JSON -> non-
discriminative / syllable / tone channel subsets, per-trial audio -> mel,
classifier zoo by name (CNN / ShallowNN / logistic / CNNRNN) with optional
pretrained checkpoints, repeat-seeded train/eval, appended results CSV,
loss curves, and N reconstructed WAVs via Griffin-Lim with side-by-side
mel figures.

Config JSON keys (as in the reference): ``mel_kwargs``,
``tone_dynamic_mapping``, ``n_syllables``, ``n_tones``.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from ..data.splits import split_indices
from ..data.utils import select_non_discriminative_channels
from ..models.deep import CNNClassifier, CNNRNNClassifier
from ..models.simple import LogisticRegressionClassifier, ShallowNNClassifier
from ..models.synthesis import SynthesisLite, SynthesisModelCNN
from ..utils.audio import audio_to_mel, compare_mels, mels_to_audio, write_wav
from ..utils.visualise import plot_training_losses
from .synthesis_trainer import SynthesisTrainer, seed_parallel_fit_eval

SYNTHESIS_MODELS = ["SynthesisLite", "SynthesisFull"]


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train an audio synthesizer on ECoG data."
    )
    # ----- I/O -----
    parser.add_argument("--sample_path", type=str, required=True)
    parser.add_argument("--subject_id", type=str, required=True)
    parser.add_argument("--result_file", type=str, required=True)
    parser.add_argument("--figure_dir", type=str, default=None)
    parser.add_argument("--audio_dir", type=str, default=None)
    parser.add_argument("--channel_file", type=str, default="channel_selections.json")
    parser.add_argument("--config_file", type=str, default="config.json")
    parser.add_argument(
        "--checkpoint_dir", type=str, default=None,
        help="Save each seed's trained synthesizer (Orbax) here; the "
             "serving module (decode_tonal_langauge_tpu.serving) loads "
             "these for end-to-end inference.",
    )
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--syllable_model_path", type=str, default=None)
    parser.add_argument("--tone_model_path", type=str, default=None)
    parser.add_argument("--synthesis_model_name", type=str, required=True)
    parser.add_argument(
        "--target_mean_init", action=argparse.BooleanOptionalAction,
        default=True,
        help="Initialise the synthesis output bias with the train-split "
             "mel mean (measured: MCD 2463 -> 503 on the paper model at "
             "30 epochs; a zero bias spends most of the budget finding "
             "the dB level under the sign-only L1 gradient). "
             "--no-target_mean_init restores reference-style init.",
    )
    parser.add_argument(
        "--dtype", type=str, default="float32",
        help="Synthesis-model compute dtype (params stay f32): bfloat16 "
             "roughly halves the SynthesisFull train step on TPU (the "
             "label LSTM is HBM-bound on its recurrent weights).",
    )
    parser.add_argument("--syllable_model_name", type=str, required=True)
    parser.add_argument("--tone_model_name", type=str, required=True)
    # ----- Audio -----
    parser.add_argument("--audio_sampling_rate", type=int, default=24414)
    parser.add_argument(
        "--n_mels", type=int, default=None,
        help="Override mel_kwargs['n_mels'] from the config JSON.",
    )
    parser.add_argument(
        "--n_fft", type=int, default=None,
        help="Override mel_kwargs['n_fft'] from the config JSON.",
    )
    parser.add_argument(
        "--hop_length", type=int, default=None,
        help="Override mel_kwargs['hop_length'] from the config JSON.",
    )
    # ----- Experiment -----
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--repeat", type=int, default=1)
    parser.add_argument(
        "--seed_parallel", type=int, default=1,
        help="Fit all repeat seeds as one vmapped jit (1, default) or "
        "loop seeds sequentially (0).",
    )
    parser.add_argument("--verbose", type=int, default=1)
    # ----- Training -----
    parser.add_argument("--train_ratio", type=float, default=0.9)
    parser.add_argument(
        "--vali_ratio", type=float, default=None,
        help="Optional validation fraction; with --test_ratio it forms a "
        "3-way split (otherwise test = 1 - train_ratio).",
    )
    parser.add_argument("--test_ratio", type=float, default=None)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument(
        "--parallel_data", type=str, default=None,
        help="Data-parallel mesh width: an integer device count or "
        "'auto' for all visible devices (supersedes the reference's "
        "--device knob for multi-chip training).",
    )
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--lr", type=float, default=0.0005)
    # ----- Optimizer (NAdam) -----
    parser.add_argument("--beta_1", type=float, default=0.9)
    parser.add_argument("--beta_2", type=float, default=0.999)
    parser.add_argument("--epsilon", type=float, default=1e-8)
    parser.add_argument(
        "--schedule_decay", type=float, default=0.004,
        help="Weight decay (the reference feeds its schedule_decay to "
        "NAdam's weight_decay).",
    )
    parser.add_argument(
        "--moment_dtype", type=str, default=None,
        choices=["float32", "bfloat16"],
        help="Store the NAdam moments in this dtype at rest (update math "
        "stays f32). bfloat16 halves the 2x-params optimizer-state HBM "
        "traffic and footprint; default keeps f32.",
    )
    # ----- Full train-state checkpointing (SURVEY §5) -----
    parser.add_argument(
        "--train_state_dir", type=str, default=None,
        help="Save the FULL per-seed train state (params, NAdam moments, "
        "RNG, epoch counter, history) there; forces the sequential "
        "per-seed path.",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="Continue a fit from --train_state_dir exactly where it "
        "left off (--epochs counts TOTAL epochs).",
    )
    parser.add_argument(
        "--checkpoint_every", type=int, default=None,
        help="Checkpoint the train state every N epochs (default: once "
        "at the end of the fit).",
    )
    parser.add_argument(
        "--evaluate_only", action="store_true",
        help="No training: load each seed's synthesizer from "
        "--checkpoint_dir, reproduce that seed's test split, and "
        "recompute the test MCD / mel Pearson r rows (same results-CSV "
        "schema as a fit). The evaluation-stage counterpart for the "
        "synthesis path.",
    )
    parser.add_argument(
        "--no_compilation_cache", action="store_true",
        help="Disable the persistent XLA compile cache (on by default; "
        "re-runs with unchanged shapes skip all jit compiles).",
    )
    return parser


def build_classifier(
    name: str,
    n_classes: int,
    n_channels: int,
    seq_length: int,
):
    """Classifier zoo by short name (reference's dispatch,
    ``train_synthesizer.py:210-273``)."""
    if name == "CNN":
        return CNNClassifier(
            input_channels=n_channels, input_length=seq_length, n_classes=n_classes
        )
    if name == "ShallowNN":
        return ShallowNNClassifier(
            input_dim=n_channels * seq_length, n_classes=n_classes
        )
    if name == "logistic":
        return LogisticRegressionClassifier(
            input_dim=n_channels * seq_length, n_classes=n_classes
        )
    if name == "CNNRNN":
        return CNNRNNClassifier(
            input_channels=n_channels, input_length=seq_length, n_classes=n_classes
        )
    raise ValueError(
        f"Unknown classifier name '{name}'; expected CNN/ShallowNN/logistic/CNNRNN."
    )


def build_synthesis_model(
    name: str, output_dim: int, n_channels: int, n_timepoints: int,
    dtype: str = "float32",
):
    import jax.numpy as jnp

    kwargs = dict(
        output_dim=output_dim, n_channels=n_channels,
        n_timepoints=n_timepoints, dtype=jnp.dtype(dtype),
    )
    if name == "SynthesisFull":
        return SynthesisModelCNN(**kwargs)
    if name == "SynthesisLite":
        return SynthesisLite(**kwargs)
    raise ValueError(
        f"Unknown synthesis model '{name}'; expected one of {SYNTHESIS_MODELS}."
    )


def _init_classifier_variables(model, sample: np.ndarray, path: Optional[str], seed=0):
    """Returns (variables, scaler): checkpoints saved by the training
    stage under ``standardize: true`` carry the train-split (mu, sd) the
    classifier expects its inputs scaled by."""
    import jax
    import jax.numpy as jnp

    variables = model.init(
        {"params": jax.random.key(seed)}, np.asarray(sample[:1]), train=False
    )
    scaler = None
    if path:
        from ..runtime.checkpoint import load_params

        restored = dict(load_params(path))
        raw_scaler = restored.pop("scaler", None)
        if raw_scaler is not None:
            scaler = (
                jnp.asarray(raw_scaler["mu"], dtype=jnp.float32),
                jnp.asarray(raw_scaler["sd"], dtype=jnp.float32),
            )
        variables = {**variables, **restored}
    return variables, scaler


def run(params: argparse.Namespace) -> dict:
    """Train the synthesizer; returns a summary dict (also appended to CSV)."""
    from ..runtime.compilation_cache import enable_compilation_cache

    enable_compilation_cache(
        not getattr(params, "no_compilation_cache", False)
    )
    if not os.path.exists(params.sample_path):
        raise FileNotFoundError(f"Data file '{params.sample_path}' does not exist.")

    for d in (params.figure_dir, params.audio_dir):
        if d:
            os.makedirs(d, exist_ok=True)
    result_dir = os.path.dirname(params.result_file)
    if result_dir:
        os.makedirs(result_dir, exist_ok=True)

    with open(params.channel_file, "r") as f:
        channel_selections = json.load(f)

    non_discriminative_channels = select_non_discriminative_channels(
        channel_selections, ["tone_discriminative", "syllable_discriminative"]
    )
    if params.verbose > 0:
        print(
            f"Found {len(non_discriminative_channels)} non-discriminative channels."
        )

    with open(params.config_file, "r") as f:
        config = json.load(f)
    mel_kwargs = dict(config["mel_kwargs"])
    for key in ("n_mels", "n_fft", "hop_length"):
        value = getattr(params, key, None)
        if value is not None:
            mel_kwargs[key] = value
    tone_dynamic_mapping = config["tone_dynamic_mapping"]
    n_syllables = config["n_syllables"]
    n_tones = config["n_tones"]

    dataset = np.load(params.sample_path)
    ecog_samples = dataset["ecog"]
    ecog_non = ecog_samples[:, non_discriminative_channels, :]
    # Sorted to match the channel order the classifier training stage
    # used (ClassificationSampleHandler sorts its channel union), so
    # pretrained classifier checkpoints see their training-time layout
    # even for hand-written channel files.
    ecog_syllables = ecog_samples[
        :, sorted(channel_selections["syllable_discriminative"]), :
    ]
    ecog_tones = ecog_samples[
        :, sorted(channel_selections["tone_discriminative"]), :
    ]
    audios = dataset["audio"]

    mels = np.stack(
        [
            audio_to_mel(audio, params.audio_sampling_rate, mel_kwargs=mel_kwargs)
            for audio in audios
        ]
    )
    if params.verbose > 0:
        print("Number of Mel spectrogram coefficients", mels.shape[1:])

    n_timepoints = ecog_non.shape[2]

    syllable_model = build_classifier(
        params.syllable_model_name, n_syllables, ecog_syllables.shape[1], n_timepoints
    )
    tone_model = build_classifier(
        params.tone_model_name, n_tones, ecog_tones.shape[1], n_timepoints
    )
    syllable_variables, syllable_scaler = _init_classifier_variables(
        syllable_model, ecog_syllables, params.syllable_model_path
    )
    tone_variables, tone_scaler = _init_classifier_variables(
        tone_model, ecog_tones, params.tone_model_path
    )

    rng = np.random.default_rng(params.seed)
    seeds = rng.integers(0, 10000, params.repeat)

    vali_ratio = getattr(params, "vali_ratio", None)
    test_ratio = getattr(params, "test_ratio", None)
    if vali_ratio is not None and test_ratio is not None:
        ratios = [params.train_ratio, vali_ratio, test_ratio]
    elif test_ratio is not None:
        ratios = [params.train_ratio, test_ratio]
    elif vali_ratio is not None:
        ratios = [params.train_ratio, vali_ratio, 1.0 - params.train_ratio - vali_ratio]
    else:
        ratios = [params.train_ratio, 1.0 - params.train_ratio]
    if abs(sum(ratios) - 1.0) > 1e-6 or any(r <= 0 for r in ratios[:1] + ratios[-1:]):
        raise ValueError(
            f"Split ratios {ratios} must be positive and sum to 1 "
            "(check --train_ratio/--vali_ratio/--test_ratio)."
        )

    from ..parallel.mesh import mesh_from_config

    mesh = mesh_from_config(
        {"data": getattr(params, "parallel_data", None)}
        if getattr(params, "parallel_data", None)
        else None
    )
    if mesh is not None:
        print(f"synthesis training on mesh {dict(mesh.shape)}")

    def make_trainer(seed: int) -> SynthesisTrainer:
        synthesis_model = build_synthesis_model(
            params.synthesis_model_name, mels.shape[1], ecog_non.shape[1],
            n_timepoints, dtype=getattr(params, "dtype", "float32"),
        )
        return SynthesisTrainer(
            synthesis_model,
            tone_model,
            tone_variables,
            syllable_model,
            syllable_variables,
            tone_dynamic_mapping,
            tone_scaler=tone_scaler,
            syllable_scaler=syllable_scaler,
            learning_rate=params.lr,
            beta_1=getattr(params, "beta_1", 0.9),
            beta_2=getattr(params, "beta_2", 0.999),
            epsilon=getattr(params, "epsilon", 1e-8),
            schedule_decay=getattr(params, "schedule_decay", 0.004),
            seed=seed,
            mesh=mesh,
            verbose=params.verbose > 0,
            moment_dtype=getattr(params, "moment_dtype", None),
        )

    splits = [
        split_indices(ecog_non.shape[0], ratios, seed=int(seed))
        for seed in seeds
    ]
    arrays = (ecog_non, ecog_syllables, ecog_tones, mels)

    # All repeat seeds as one vmapped jit (SURVEY §2.7's repeat axis; same
    # redesign as the classifier's seed_parallel). A mesh keeps the
    # sequential per-seed path: there the per-BATCH axis is sharded.
    # Full train-state checkpointing runs the sequential per-seed path
    # (the vmapped multi-seed fit has no per-seed resume granularity).
    train_state_dir = getattr(params, "train_state_dir", None)
    evaluate_only = bool(getattr(params, "evaluate_only", False))
    if evaluate_only and not getattr(params, "checkpoint_dir", None):
        raise ValueError(
            "--evaluate_only needs --checkpoint_dir pointing at the "
            "synthesizer checkpoints a previous fit saved."
        )
    seed_parallel = (
        bool(getattr(params, "seed_parallel", True))
        and len(seeds) > 1
        and mesh is None
        and not train_state_dir
        and not evaluate_only
    )
    def _save_checkpoint(seed, model_params, model_batch_stats):
        if not getattr(params, "checkpoint_dir", None):
            return
        from ..runtime.checkpoint import save_params

        os.makedirs(params.checkpoint_dir, exist_ok=True)
        tree = {"params": model_params}
        if model_batch_stats:
            tree["batch_stats"] = model_batch_stats
        save_params(
            os.path.join(
                params.checkpoint_dir,
                f"{params.synthesis_model_name}_seed_{int(seed)}",
            ),
            tree,
        )

    tm_init = bool(getattr(params, "target_mean_init", True))

    if seed_parallel:
        trainer = make_trainer(int(seeds[0]))
        train_stacks = tuple(
            np.stack([arr[s[0]] for s in splits]) for arr in arrays
        )
        test_stacks = tuple(
            np.stack([arr[s[-1]] for s in splits]) for arr in arrays
        )
        target_means = (
            np.stack([mels[s[0]].mean(axis=0) for s in splits])
            if tm_init
            else None
        )
        per_seed = seed_parallel_fit_eval(
            trainer, [int(s) for s in seeds], train_stacks, test_stacks,
            epochs=params.epochs, batch_size=params.batch_size,
            target_means=target_means,
        )
        if getattr(params, "checkpoint_dir", None):
            import jax as _jax

            for i, seed in enumerate(seeds):
                _save_checkpoint(
                    seed,
                    _jax.tree_util.tree_map(
                        lambda leaf: leaf[i], trainer.stacked_params
                    ),
                    _jax.tree_util.tree_map(
                        lambda leaf: leaf[i], trainer.stacked_batch_stats
                    ),
                )
    elif evaluate_only:
        # Frozen re-evaluation (the synthesis counterpart of the
        # pipeline's evaluation stage): each seed's split is reproduced
        # from the SAME seed stream a fit uses, so the MCD / mel-r rows
        # are bit-comparable with the training run's results CSV.
        per_seed = []
        for seed, idx_splits in zip(seeds, splits):
            te_idx = idx_splits[-1]
            trainer = make_trainer(int(seed))
            ckpt = os.path.join(
                params.checkpoint_dir,
                f"{params.synthesis_model_name}_seed_{int(seed)}",
            )
            if not os.path.isdir(ckpt):
                raise FileNotFoundError(
                    f"Synthesizer checkpoint {ckpt} not found — run the "
                    "fit with --checkpoint_dir first (and the same "
                    "--seed/--repeat so the seed streams line up)."
                )
            trainer.load_checkpoint(ckpt)
            mcd, recon_mels, origin_mels = trainer.evaluate(
                tuple(arr[te_idx] for arr in arrays),
                batch_size=params.batch_size,
            )
            per_seed.append((None, mcd, recon_mels, origin_mels))
    else:
        per_seed = []
        for seed, idx_splits in zip(seeds, splits):
            tr_idx, te_idx = idx_splits[0], idx_splits[-1]
            trainer = make_trainer(int(seed))
            history = trainer.train(
                tuple(arr[tr_idx] for arr in arrays),
                epochs=params.epochs,
                batch_size=params.batch_size,
                verbose=params.verbose > 1,
                target_mean=mels[tr_idx].mean(axis=0) if tm_init else None,
                checkpoint_dir=(
                    os.path.join(
                        train_state_dir,
                        f"{params.synthesis_model_name}_seed_{int(seed)}",
                    )
                    if train_state_dir
                    else None
                ),
                resume=bool(getattr(params, "resume", False)),
                checkpoint_every=getattr(params, "checkpoint_every", None),
            )
            mcd, recon_mels, origin_mels = trainer.evaluate(
                tuple(arr[te_idx] for arr in arrays),
                batch_size=params.batch_size,
            )
            per_seed.append((history, mcd, recon_mels, origin_mels))
            _save_checkpoint(seed, trainer.params, trainer.batch_stats)

    mcds = []
    pearson_rs = []
    last = None
    for seed, (history, mcd, recon_mels, origin_mels) in zip(seeds, per_seed):
        mcds.append(mcd)
        # Spectrogram fidelity: Pearson r between reconstructed and
        # origin test mels (the BASELINE target metric alongside MCD).
        pearson_rs.append(
            float(
                np.corrcoef(
                    np.asarray(recon_mels).ravel(),
                    np.asarray(origin_mels).ravel(),
                )[0, 1]
            )
        )
        last = (history, recon_mels, origin_mels)
        if params.verbose > 0:
            print(
                f"Seed {seed}: test MCD = {mcd:.4f}, "
                f"mel Pearson r = {pearson_rs[-1]:.4f}"
            )

    summary = {
        "model_name": params.model_name,
        "synthesis_model": params.synthesis_model_name,
        "subject": params.subject_id,
        "model_size": trainer.n_params(),
        "seeds": str(list(map(int, seeds))),
        "mcd_mean": float(np.mean(mcds)),
        "mcd_std": float(np.std(mcds)),
        "mcd_all": str([float(m) for m in mcds]),
        "mel_pearson_r_mean": float(np.mean(pearson_rs)),
        "mel_pearson_r_std": float(np.std(pearson_rs)),
    }

    import pandas as pd

    df = pd.DataFrame([summary])
    if os.path.exists(params.result_file):
        df.to_csv(params.result_file, mode="a", header=False, index=False)
    else:
        df.to_csv(params.result_file, index=False)

    history, recon_mels, origin_mels = last
    n_mels = mel_kwargs.get("n_mels", 128)

    if params.figure_dir and history is not None:
        plot_training_losses(
            history,
            labels=("L1 loss", "MCD"),
            figure_path=os.path.join(params.figure_dir, "training_losses.png"),
        )

    n_waves = min(10, recon_mels.shape[0])
    if params.figure_dir:
        for i in range(n_waves):
            compare_mels(
                origin_mels[i].reshape(n_mels, -1),
                recon_mels[i].reshape(n_mels, -1),
                audio_sampling_rate=params.audio_sampling_rate,
                title1="Original",
                title2="Reconstruction",
                file_path=os.path.join(params.figure_dir, f"mel_compare_{i}.png"),
            )
    if params.audio_dir and n_waves:
        # All 2*n_waves inversions (origin + recon) as ONE vmapped
        # NNLS + Griffin-Lim dispatch (the reference loops librosa's
        # inverse per wav, /root/reference/train_synthesizer.py:402-445).
        stacked = np.concatenate(
            [origin_mels[:n_waves], recon_mels[:n_waves]], axis=0
        )
        waves = mels_to_audio(
            stacked,
            n_mels=n_mels,
            audio_sampling_rate=params.audio_sampling_rate,
            n_fft=mel_kwargs.get("n_fft", 2048),
            hop_length=mel_kwargs.get("hop_length", 512),
        )
        for i in range(n_waves):
            for tag, wave in (
                ("origin", waves[i]), ("recon", waves[n_waves + i]),
            ):
                write_wav(
                    os.path.join(params.audio_dir, f"{tag}_{i}.wav"),
                    wave,
                    params.audio_sampling_rate,
                )

    return summary


if __name__ == "__main__":
    from ..runtime.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    run(build_parser().parse_args())
