"""End-to-end inference: trained artifacts -> decoded labels + speech.

The reference stops at training scripts — its only "inference" is the
evaluation block inside ``/root/reference/train_synthesizer.py:363-445``,
which cannot run without re-training. This module is the production
serving path the reference lacks: load the pipeline's trained artifacts
(classifier checkpoints from ``train_classifier`` with
``save_checkpoints``, a synthesizer checkpoint from ``train_synthesizer
--checkpoint_dir``, the channel-selection JSON, and the dataset config
JSON) and decode new ECoG epochs in one jitted dispatch per batch:

    epochs (B, C, T)
      -> tone + syllable classifier probabilities        (frozen params)
      -> predicted label dynamics (dense-table gather, on device)
      -> synthesizer mel spectrograms
      -> Griffin-Lim waveforms (jitted NNLS + momentum GL)

Everything up to the waveform is ONE ``jax.jit`` function; the full
trial->speech path is TPU-resident with a single host readback for the
results. CLI:

    python -m decode_tonal_langauge_tpu.serving \
        --sample_path samples.npz --channel_file channels.json \
        --config_file config.json \
        --tone_model_name CNNRNN --tone_model_path ckpt/tone \
        --syllable_model_name CNN --syllable_model_path ckpt/syll \
        --synthesis_model_name SynthesisLite --synthesis_model_path ckpt/syn \
        --output_dir decoded/ [--n_wavs 4] [--benchmark]

or, pointing at a training-stage run directly (models, kwargs — incl.
``model.per_target`` overrides — checkpoint paths, and the default
channel file are recovered from its provenance ``config.yaml``):

    python -m decode_tonal_langauge_tpu.serving \
        --sample_path subject_1.npz --training_dir logs/cnn__abc123 \
        --output_dir decoded/ [--seed 7270]

Writes ``predictions.csv`` (per-trial predicted/true labels), ``mels.npz``
(predicted mel spectrograms), and the first N reconstructed WAVs.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.utils import (
    select_non_discriminative_channels,
    tone_dynamics_table,
)


class TonalDecoder:
    """Frozen-model decoder: ECoG epochs -> labels (+ mels, + audio).

    Mirrors the frozen-classifier + dynamics-gather design of
    ``training/synthesis_trainer.py`` (itself replacing the reference's
    per-batch host round trip, ``/root/reference/models/
    synthesis_trainer.py:150-171``), but with ALL models frozen.
    """

    def __init__(
        self,
        tone_model,
        tone_variables,
        syllable_model,
        syllable_variables,
        tone_dynamic_mapping: Dict[str, Any],
        synthesis_model=None,
        synthesis_variables=None,
        tone_scaler=None,
        syllable_scaler=None,
        mesh=None,
    ) -> None:
        self.tone_model = tone_model
        self.tone_variables = tone_variables
        self.syllable_model = syllable_model
        self.syllable_variables = syllable_variables
        self.synthesis_model = synthesis_model
        self.synthesis_variables = synthesis_variables
        # (mu, sd) train-split standardisation the classifiers were
        # trained under (checkpointed by the training stage when
        # standardize: true) — must be reproduced at inference.
        self.tone_scaler = tone_scaler
        self.syllable_scaler = syllable_scaler
        table, self.n_dynamics = tone_dynamics_table(tone_dynamic_mapping)
        self.dynamics_table = jnp.asarray(table, dtype=jnp.float32)

        # Optional device mesh: the decode batch axis shards over `data`
        # (params replicate) — the scale-out layout for batch serving.
        from .parallel.mesh import DataParallelLayout

        self.mesh = mesh
        self._layout = DataParallelLayout(mesh)
        if mesh is not None:
            put = self._layout.replicate_tree
            self.tone_variables = put(self.tone_variables)
            self.syllable_variables = put(self.syllable_variables)
            self.dynamics_table = put(self.dynamics_table)
            if self.synthesis_variables is not None:
                self.synthesis_variables = put(self.synthesis_variables)
            if self.tone_scaler is not None:
                self.tone_scaler = put(self.tone_scaler)
            if self.syllable_scaler is not None:
                self.syllable_scaler = put(self.syllable_scaler)

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0,))
    def _decode_jit(self, x_tone, x_syll, ecog_non):
        if self.tone_scaler is not None:
            mu, sd = self.tone_scaler
            x_tone = (x_tone - mu) / sd
        if self.syllable_scaler is not None:
            mu, sd = self.syllable_scaler
            x_syll = (x_syll - mu) / sd
        tone_probs = self.tone_model.apply(
            self.tone_variables, x_tone, train=False
        )
        syll_probs = self.syllable_model.apply(
            self.syllable_variables, x_syll, train=False
        )
        tones = jnp.argmax(tone_probs, axis=1)
        sylls = jnp.argmax(syll_probs, axis=1)

        mel = None
        if self.synthesis_model is not None:
            contour = self.dynamics_table[tones]  # (B, n_dynamics)
            syll_seq = jnp.broadcast_to(
                sylls[:, None].astype(jnp.float32), contour.shape
            )
            dynamics = jnp.stack([syll_seq, contour], axis=1)
            mel = self.synthesis_model.apply(
                self.synthesis_variables, ecog_non, dynamics, train=False
            )
        return tones, sylls, tone_probs, syll_probs, mel

    def decode(
        self,
        ecog_samples: np.ndarray,
        channel_selections: Dict[str, Any],
    ) -> Dict[str, np.ndarray]:
        """Decode epochs (B, C_total, T): returns predicted tone and
        syllable ids, class probabilities, and (with a synthesizer) the
        predicted flattened mel spectrograms."""
        # Sorted: the training stage's sample handler sorts channel
        # subsets, so checkpointed weights and scaler rows are laid out
        # in ascending channel order. The channel gathers run wherever
        # the input lives — a device-resident batch (decode_stream's
        # on-device window gather) never round-trips through the host.
        n = ecog_samples.shape[0]
        if n == 0:
            raise ValueError(
                "decode() received zero trials — the ecog array in the "
                "sample npz is empty."
            )
        x = jnp.asarray(ecog_samples, dtype=jnp.float32)
        tone_idx = np.asarray(
            sorted(channel_selections["tone_discriminative"]), dtype=np.int32
        )
        syll_idx = np.asarray(
            sorted(channel_selections["syllable_discriminative"]),
            dtype=np.int32,
        )
        non = np.asarray(
            select_non_discriminative_channels(
                channel_selections,
                ["tone_discriminative", "syllable_discriminative"],
            ),
            dtype=np.int32,
        )
        x_tone = x[:, tone_idx, :]
        x_syll = x[:, syll_idx, :]
        ecog_non = x[:, non, :]

        # With a mesh, pad the batch to a multiple of `data` and shard
        # the sample axis; padding rows are dropped from the outputs.
        from .parallel.mesh import fetch_global, shard_batch

        pad = self._layout.round_batch(n) - n
        inputs = []
        for arr in (x_tone, x_syll, ecog_non):
            if pad:
                arr = jnp.concatenate(
                    [arr, jnp.repeat(arr[-1:], pad, axis=0)], axis=0
                )
            inputs.append(
                shard_batch(self.mesh, arr)
                if self.mesh is not None
                else arr
            )

        tones, sylls, tone_probs, syll_probs, mel = self._decode_jit(*inputs)
        # fetch_global: a cross-host data mesh leaves these sharded with
        # non-addressable pieces, where plain np.asarray raises.
        out = {
            "tone": fetch_global(tones)[:n],
            "syllable": fetch_global(sylls)[:n],
            "tone_probs": fetch_global(tone_probs)[:n],
            "syllable_probs": fetch_global(syll_probs)[:n],
        }
        if mel is not None:
            out["mel"] = fetch_global(mel)[:n]
        return out

    def decode_stream(
        self,
        recording: np.ndarray,
        channel_selections: Dict[str, Any],
        window: int,
        hop: int,
        max_batch: int = 1024,
    ) -> Dict[str, np.ndarray]:
        """Sliding-window decode of a CONTINUOUS recording (C, T).

        Every ``hop``-spaced window of ``window`` samples is decoded in
        ONE batched dispatch — the streaming/real-time path. The
        reference has no consumer for continuous recordings (its
        unlabelled sliding-window collector,
        ``/root/reference/data_loading/dataloaders.py:77-170``, produces
        patches nothing reads); here the windows are gathered on device
        (``ops/framing.extract_epochs``) and fed to the same frozen
        decode as epoch serving. Returns the epoch-decode outputs plus
        ``window_start`` (sample index of each window).
        """
        from .ops.framing import extract_epochs

        recording = np.asarray(recording, dtype=np.float32)
        if recording.ndim != 2:
            raise ValueError(
                f"decode_stream expects a (channels, samples) recording; "
                f"got shape {recording.shape}"
            )
        window, hop = int(window), max(int(hop), 1)
        n_samples = recording.shape[1]
        if window > n_samples:
            raise ValueError(
                f"window ({window} samples) exceeds the recording "
                f"({n_samples} samples)"
            )
        starts = np.arange(0, n_samples - window + 1, hop, dtype=np.int32)
        # max_batch bounds device memory on long recordings (an hour at
        # 400 Hz / 0.1 s hop is ~36k windows): decode in fixed-size
        # chunks — each still one batched dispatch, and every chunk but
        # the last reuses one compiled program. The gathered windows
        # stay ON DEVICE into decode (no host round trip per chunk).
        max_batch = max(int(max_batch), 1)
        rec_dev = jnp.asarray(recording)
        chunks = []
        for lo in range(0, len(starts), max_batch):
            chunk_starts = starts[lo : lo + max_batch]
            epochs = extract_epochs(
                rec_dev, jnp.asarray(chunk_starts), window
            )
            chunks.append(self.decode(epochs, channel_selections))
        out = {
            k: np.concatenate([c[k] for c in chunks], axis=0)
            for k in chunks[0]
        }
        out["window_start"] = starts
        return out

    def synthesize_wavs(
        self,
        mels_flat: np.ndarray,
        sr: int,
        mel_kwargs: Dict[str, Any],
        n: Optional[int] = None,
    ):
        """Griffin-Lim waveforms from flattened predicted mels — the
        whole batch (NNLS + GL per trial, vmapped) is ONE dispatch."""
        from .utils.audio import mels_to_audio

        n = mels_flat.shape[0] if n is None else min(n, mels_flat.shape[0])
        if n <= 0:
            # --n_wavs 0 / empty mels: skip waveform synthesis (the
            # batched reshape below rejects zero-row inputs).
            return []
        waves = mels_to_audio(
            mels_flat[:n],
            n_mels=mel_kwargs.get("n_mels", 128),
            audio_sampling_rate=sr,
            n_fft=mel_kwargs.get("n_fft", 2048),
            hop_length=mel_kwargs.get("hop_length", 512),
        )
        return list(waves)


# ----------------------------------------------------------------------
# The synthesizer CLI's short model names, resolved through the model
# factory so model_kwargs (dtype, lstm_dim, custom dotted-path classes)
# reproduce exactly what the training stage built.
_CLASSIFIER_SHORT_NAMES = {
    "CNN": "models.deep_classifiers.CNNClassifier",
    "CNNRNN": "models.deep_classifiers.CNNRNNClassifier",
    "ShallowNN": "models.simple_classifiers.ShallowNNClassifier",
    "logistic": "models.simple_classifiers.LogisticRegressionClassifier",
}


def _build_classifier(name, n_classes, n_channels, n_timepoints,
                      model_kwargs=None):
    from .models.factory import get_classifier_by_name

    return get_classifier_by_name(
        _CLASSIFIER_SHORT_NAMES.get(name, name),
        n_classes=n_classes,
        n_channels=n_channels,
        seq_length=n_timepoints,
        classifier_kwargs=model_kwargs or {},
    )


def load_decoder(
    channel_selections: Dict[str, Any],
    dataset_config: Dict[str, Any],
    n_timepoints: int,
    tone_model_name: str,
    tone_model_path: str,
    syllable_model_name: str,
    syllable_model_path: str,
    synthesis_model_name: Optional[str] = None,
    synthesis_model_path: Optional[str] = None,
    mel_dim: Optional[int] = None,
    tone_model_kwargs: Optional[Dict[str, Any]] = None,
    syllable_model_kwargs: Optional[Dict[str, Any]] = None,
    synthesis_dtype: str = "float32",
    mesh=None,
) -> TonalDecoder:
    """Rebuild the frozen models from checkpoints and wire a decoder."""
    from .runtime.checkpoint import load_params
    from .training.train_synthesizer import build_synthesis_model

    if bool(synthesis_model_name) != bool(synthesis_model_path):
        raise ValueError(
            "synthesis_model_name and synthesis_model_path must be given "
            "together (got one without the other)."
        )
    n_tone_ch = len(channel_selections["tone_discriminative"])
    n_syll_ch = len(channel_selections["syllable_discriminative"])
    tone_model = _build_classifier(
        tone_model_name, dataset_config["n_tones"], n_tone_ch, n_timepoints,
        model_kwargs=tone_model_kwargs,
    )
    syll_model = _build_classifier(
        syllable_model_name, dataset_config["n_syllables"], n_syll_ch,
        n_timepoints, model_kwargs=syllable_model_kwargs,
    )
    def _load_with_scaler(path):
        restored = dict(load_params(path))
        scaler = restored.pop("scaler", None)
        if scaler is not None:
            scaler = (
                jnp.asarray(scaler["mu"], dtype=jnp.float32),
                jnp.asarray(scaler["sd"], dtype=jnp.float32),
            )
        return restored, scaler

    tone_variables, tone_scaler = _load_with_scaler(tone_model_path)
    syllable_variables, syllable_scaler = _load_with_scaler(
        syllable_model_path
    )

    synthesis_model = synthesis_variables = None
    if synthesis_model_name and synthesis_model_path:
        non = select_non_discriminative_channels(
            channel_selections,
            ["tone_discriminative", "syllable_discriminative"],
        )
        # ONE restore: the checkpoint is authoritative for the output
        # dim (head-bias shape); an explicit mel_dim only covers custom
        # models without a known head.
        synthesis_variables = load_params(synthesis_model_path)
        inferred = _mel_dim_from_variables(synthesis_variables)
        if inferred is not None:
            mel_dim = inferred
        if mel_dim is None:
            raise ValueError(
                "could not determine the synthesizer output dim: the "
                "checkpoint has no known output head (output_layer/fc2) "
                "and no mel_dim was supplied (config mel_dim field, "
                "or audio in the sample npz to probe)."
            )
        synthesis_model = build_synthesis_model(
            synthesis_model_name, mel_dim, len(non), n_timepoints,
            dtype=synthesis_dtype,
        )

    return TonalDecoder(
        tone_model,
        tone_variables,
        syll_model,
        syllable_variables,
        dataset_config["tone_dynamic_mapping"],
        synthesis_model=synthesis_model,
        synthesis_variables=synthesis_variables,
        tone_scaler=tone_scaler,
        syllable_scaler=syllable_scaler,
        mesh=mesh,
    )


def _mel_dim_from_variables(restored) -> Optional[int]:
    """Synthesizer output dim from restored variables' head-bias shape.

    Both synthesis models end in a Dense head — ``output_layer``
    (SynthesisModelCNN) / ``fc2`` (SynthesisLite); its bias length IS the
    flattened mel dim. Custom models without a known head return None and
    the caller falls back to config/audio probes."""
    params = restored.get("params", restored)
    for head in ("output_layer", "fc2"):
        if head in params and "bias" in params[head]:
            return int(np.asarray(params[head]["bias"]).shape[0])
    return None


# ----------------------------------------------------------------------
def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Decode ECoG epochs with trained models (serving path)."
    )
    p.add_argument(
        "--sample_path", type=str, default=None,
        help="Epoch npz (ecog (N,C,T) [+ tone/syllable/audio]) to "
             "decode. Required unless --stream_recording is given.",
    )
    p.add_argument(
        "--stream_recording", type=str, default=None,
        help="STREAMING mode: a continuous-recording npz — either a "
             "preprocess-stage block file ({data: (C,T), sf}) or "
             "{ecog, ecog_sf} — decoded as hop-spaced sliding windows "
             "in one batched dispatch (replaces --sample_path).",
    )
    p.add_argument(
        "--stream_window_s", type=float, default=None,
        help="Streaming window length in seconds; MUST equal the "
             "training epochs' sample_length (the models have a fixed "
             "input length). Required with --stream_recording.",
    )
    p.add_argument(
        "--stream_hop_s", type=float, default=0.1,
        help="Streaming hop between windows in seconds (default 0.1).",
    )
    p.add_argument(
        "--stream_min_windows", type=int, default=3,
        help="Streaming event rule: a decoded event is a run of at "
             "least this many consecutive windows predicting the same "
             "(tone, syllable) — written to events.csv.",
    )
    p.add_argument("--channel_file", type=str, default=None)
    p.add_argument("--config_file", type=str, default=None)
    p.add_argument(
        "--training_dir", type=str, default=None,
        help="A training-stage output dir (save_checkpoints: true): the "
             "classifier models, kwargs (incl. model.per_target "
             "overrides), checkpoint paths, and default channel_file are "
             "recovered from its provenance config.yaml — replaces the "
             "four --*_model_name/--*_model_path flags.",
    )
    p.add_argument(
        "--seed", type=int, default=None,
        help="With --training_dir: which repeat seed's checkpoints to "
             "serve (must be in the run's seed stream; default: the "
             "first).",
    )
    p.add_argument(
        "--subject_id", type=str, default=None,
        help="With --training_dir: subject whose checkpoints to load "
             "(default: parsed from the sample filename "
             "'subject_<id>.npz').",
    )
    p.add_argument("--tone_model_name", type=str, default=None)
    p.add_argument("--tone_model_path", type=str, default=None)
    p.add_argument("--syllable_model_name", type=str, default=None)
    p.add_argument("--syllable_model_path", type=str, default=None)
    p.add_argument("--synthesis_model_name", type=str, default=None)
    p.add_argument("--synthesis_model_path", type=str, default=None)
    p.add_argument(
        "--tone_model_kwargs", type=str, default=None,
        help='JSON dict of model kwargs used at training time, e.g. '
             '\'{"lstm_dim": 400, "dtype": "bfloat16"}\'.',
    )
    p.add_argument("--syllable_model_kwargs", type=str, default=None)
    p.add_argument(
        "--synthesis_dtype", type=str, default="float32",
        help="Synthesis-model compute dtype (match --dtype at training "
             "time if it was set; params are f32 either way).",
    )
    p.add_argument("--audio_sampling_rate", type=int, default=24414)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--n_wavs", type=int, default=4)
    p.add_argument(
        "--benchmark", action="store_true",
        help="Also report single-trial end-to-end decode latency.",
    )
    p.add_argument(
        "--parallel_data", type=int, default=None,
        help="Shard the decode batch over a `data` mesh of this many "
             "devices (params replicate).",
    )
    p.add_argument(
        "--no_compilation_cache", action="store_true",
        help="Disable the persistent XLA compile cache (on by default; "
             "re-runs with unchanged shapes skip all jit compiles).",
    )
    return p


def _configure_from_training_dir(params: argparse.Namespace) -> Dict[str, Any]:
    """Fill the classifier model/checkpoint flags from a training run.

    Reads the run's provenance ``config.yaml`` (the same recovery the
    evaluation stage performs) and resolves, per target, the model
    dotted path / kwargs — including ``model.per_target`` overrides —
    and the ``checkpoint_name``-keyed Orbax path. Returns the pieces of
    a dataset config derivable from provenance (label counts), used
    when no ``--config_file`` is given."""
    from .config import (
        flatten_training_provenance,
        load_config,
        namespace_training_params,
    )
    from .training.classifier_pipeline import (
        checkpoint_name,
        target_model_params,
    )
    from .utils.seeding import seed_stream

    conflicting = [
        f"--{a}"
        for a in (
            "tone_model_name", "tone_model_path", "tone_model_kwargs",
            "syllable_model_name", "syllable_model_path",
            "syllable_model_kwargs",
        )
        if getattr(params, a, None)
    ]
    if conflicting:
        raise ValueError(
            f"--training_dir recovers the classifier flags from provenance "
            f"and would silently override {', '.join(conflicting)} — pass "
            "either --training_dir or the explicit model flags, not both."
        )

    cfg_path = os.path.join(params.training_dir, "config.yaml")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(
            f"No config.yaml in {params.training_dir} — --training_dir "
            "must point at a training-stage output directory."
        )
    provenance = load_config(cfg_path) or {}
    flat = flatten_training_provenance(provenance)
    ns = namespace_training_params(flat)

    targets = list(getattr(ns, "targets", []) or [])
    if "tone" not in targets or "syllable" not in targets:
        raise ValueError(
            f"--training_dir run trained targets {targets}; serving needs "
            "checkpoints for both 'tone' and 'syllable'."
        )
    if not getattr(ns, "separate_models", False):
        raise ValueError(
            "--training_dir points at a joint-model run (separate_models: "
            "false); serving decodes per-target checkpoints — pass the "
            "model flags explicitly for joint checkpoints."
        )
    if not getattr(ns, "save_checkpoints", False):
        raise ValueError(
            "--training_dir run did not save checkpoints "
            "(training.save_checkpoints: true is required)."
        )

    subject = params.subject_id
    if subject is None:
        stem = os.path.basename(params.sample_path or "")
        if stem.startswith("subject_") and stem.endswith(".npz"):
            subject = stem[len("subject_"):-len(".npz")]
        else:
            raise ValueError(
                "--subject_id is required with --training_dir when the "
                "sample filename is not 'subject_<id>.npz' (streaming "
                "mode has no sample filename to parse)."
            )

    # Stash the subject's training epoch length from provenance: a
    # streaming run must use the SAME window (the checkpointed weights
    # restore into any window length without error, so a mismatch would
    # decode silently wrong instead of loudly).
    subjects_cfg = (
        (provenance.get("sample_collection") or {}).get("params") or {}
    ).get("subjects") or {}
    entry = subjects_cfg.get(subject)
    if entry is None:
        try:
            entry = subjects_cfg.get(int(subject))
        except (TypeError, ValueError):
            entry = None
    if isinstance(entry, dict) and entry.get("sample_length") is not None:
        params._provenance_sample_length = float(entry["sample_length"])

    # The run's seed stream (reference scheme, same as train_classifier).
    seeds = seed_stream(getattr(ns, "seed", 42), getattr(ns, "repeat", 1))
    seed = int(params.seed) if params.seed is not None else int(seeds[0])
    if seed not in set(int(s) for s in seeds):
        raise ValueError(
            f"--seed {seed} is not in this run's seed stream "
            f"{[int(s) for s in seeds]}."
        )

    for target, name_attr, path_attr, kwargs_attr in (
        ("tone", "tone_model_name", "tone_model_path", "tone_model_kwargs"),
        ("syllable", "syllable_model_name", "syllable_model_path",
         "syllable_model_kwargs"),
    ):
        tp = target_model_params(ns, target)
        tp.subject_id = subject
        ckpt = os.path.join(
            params.training_dir,
            "model_checkpoints",
            checkpoint_name(tp, target, seed),
        )
        if not os.path.exists(ckpt):
            raise FileNotFoundError(f"Checkpoint {ckpt} not found.")
        setattr(params, name_attr, tp.model)
        setattr(params, path_attr, ckpt)
        setattr(
            params, kwargs_attr, getattr(tp, "model_kwargs", None) or None
        )

    if params.channel_file is None:
        channel_dir = getattr(ns, "channel_selection_dir", None)
        if channel_dir:
            params.channel_file = os.path.join(
                channel_dir, f"subject_{subject}.json"
            )

    # Dataset-config pieces derivable from provenance — classifier-only
    # decode. A synthesizer decode MUST pass the synthesizer's
    # --config_file: its tone_dynamic_mapping (the real multi-point
    # contours the checkpoint was trained on) and mel_kwargs are not in
    # the classifier provenance; the placeholder mapping below only
    # feeds the (unused-for-labels) dynamics table. run() rejects the
    # synthesis flags without --config_file.
    n_tones = len(getattr(ns, "tone_labels", []) or [])
    n_syllables = len(getattr(ns, "syllable_labels", []) or [])
    if n_tones == 0 or n_syllables == 0:
        raise ValueError(
            "The training provenance records no tone_labels/"
            "syllable_labels (dataset section) — pass --config_file with "
            "n_tones/n_syllables to decode without them."
        )
    return {
        "n_tones": n_tones,
        "n_syllables": n_syllables,
        "tone_dynamic_mapping": {
            str(i): [float(i)] for i in range(n_tones)
        },
        "mel_kwargs": {},
    }


def run(params: argparse.Namespace) -> Dict[str, Any]:
    from .runtime.compilation_cache import enable_compilation_cache
    from .utils.audio import audio_to_mel, write_wav

    enable_compilation_cache(
        not getattr(params, "no_compilation_cache", False)
    )

    provenance_dataset_config = None
    if getattr(params, "training_dir", None):
        provenance_dataset_config = _configure_from_training_dir(params)
    else:
        missing = [
            f"--{a}"
            for a in ("tone_model_name", "tone_model_path",
                      "syllable_model_name", "syllable_model_path",
                      "channel_file")
            if not getattr(params, a, None)
        ]
        if missing:
            raise ValueError(
                f"{', '.join(missing)} required (or pass --training_dir "
                "to recover them from a training run's provenance)."
            )

    if params.channel_file is None:
        raise ValueError(
            "--channel_file required: the training provenance recorded no "
            "channel_selection_dir to derive it from."
        )
    with open(params.channel_file) as f:
        channel_selections = json.load(f)
    if params.config_file:
        with open(params.config_file) as f:
            dataset_config = json.load(f)
    elif provenance_dataset_config is not None:
        if params.synthesis_model_name or params.synthesis_model_path:
            raise ValueError(
                "a synthesizer decode needs --config_file (the "
                "synthesizer's JSON: tone_dynamic_mapping contours + "
                "mel_kwargs) — the classifier provenance only derives "
                "label counts."
            )
        dataset_config = provenance_dataset_config
    else:
        raise ValueError(
            "--config_file required (or pass --training_dir to derive "
            "label counts from the run's provenance)."
        )

    streaming = bool(getattr(params, "stream_recording", None))
    if streaming:
        if params.sample_path:
            raise ValueError(
                "pass either --sample_path (epoch decode) or "
                "--stream_recording (sliding-window decode), not both."
            )
        if not getattr(params, "stream_window_s", None):
            raise ValueError(
                "--stream_window_s is required with --stream_recording "
                "(it must equal the training epochs' sample_length)."
            )
        recording, stream_sf = _load_recording(params.stream_recording)
        expect = getattr(params, "_provenance_sample_length", None)
        if expect is not None and abs(
            params.stream_window_s - expect
        ) > 1e-9:
            raise ValueError(
                f"--stream_window_s {params.stream_window_s} does not "
                f"match the training run's sample_length {expect} "
                "(provenance) — the models were trained on that epoch "
                "length and would decode a different window silently "
                "wrong."
            )
        window = int(round(params.stream_window_s * stream_sf))
        hop = int(round(params.stream_hop_s * stream_sf))
        dataset = {}
        ecog = None
        n_timepoints = window
    elif params.sample_path:
        dataset = np.load(params.sample_path)
        ecog = dataset["ecog"]
        n_timepoints = ecog.shape[2]
    else:
        raise ValueError(
            "--sample_path (epoch decode) or --stream_recording "
            "(sliding-window decode) is required."
        )

    mel_kwargs = dict(dataset_config.get("mel_kwargs", {}))
    mel_dim = None
    if params.synthesis_model_name:
        # The synthesizer's output dim: load_decoder reads it from the
        # checkpoint's head-bias shape (always present, no audio needed —
        # NEW epochs being decoded won't carry ground-truth audio). The
        # config field / training-audio probe below are fallbacks for
        # custom models without a known output head.
        mel_dim = dataset_config.get("mel_dim")
        if mel_dim is None and "audio" in dataset:  # empty in streaming
            probe = audio_to_mel(
                dataset["audio"][0], params.audio_sampling_rate,
                mel_kwargs=mel_kwargs,
            )
            mel_dim = int(probe.size)

    from .parallel.mesh import mesh_from_config

    mesh = (
        mesh_from_config({"data": params.parallel_data})
        if getattr(params, "parallel_data", None)
        else None
    )
    decoder = load_decoder(
        channel_selections,
        dataset_config,
        n_timepoints,
        params.tone_model_name,
        params.tone_model_path,
        params.syllable_model_name,
        params.syllable_model_path,
        synthesis_model_name=params.synthesis_model_name,
        synthesis_model_path=params.synthesis_model_path,
        mel_dim=mel_dim,
        tone_model_kwargs=_parse_model_kwargs(params.tone_model_kwargs),
        syllable_model_kwargs=_parse_model_kwargs(
            params.syllable_model_kwargs
        ),
        synthesis_dtype=params.synthesis_dtype,
        mesh=mesh,
    )

    if streaming:
        return _run_stream(
            params, decoder, recording, stream_sf, window, hop,
            channel_selections, mel_kwargs,
        )

    out = decoder.decode(ecog, channel_selections)

    os.makedirs(params.output_dir, exist_ok=True)
    summary: Dict[str, Any] = {"n_trials": int(ecog.shape[0])}

    # predictions.csv with true labels when the npz carries them.
    rows = []
    has_true = "tone" in dataset and "syllable" in dataset
    for i in range(ecog.shape[0]):
        row = {
            "trial": i,
            "tone_pred": int(out["tone"][i]),
            "syllable_pred": int(out["syllable"][i]),
        }
        if has_true:
            row["tone_true"] = int(dataset["tone"][i])
            row["syllable_true"] = int(dataset["syllable"][i])
        rows.append(row)
    csv_path = os.path.join(params.output_dir, "predictions.csv")
    fieldnames = ["trial", "tone_pred", "syllable_pred"] + (
        ["tone_true", "syllable_true"] if has_true else []
    )
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        writer.writerows(rows)
    if has_true:
        summary["tone_accuracy"] = float(
            np.mean(out["tone"] == dataset["tone"])
        )
        summary["syllable_accuracy"] = float(
            np.mean(out["syllable"] == dataset["syllable"])
        )

    if "mel" in out:
        np.savez(
            os.path.join(params.output_dir, "mels.npz"),
            mel=out["mel"],
            n_mels=np.asarray(mel_kwargs.get("n_mels", 128)),
        )
        if "audio" in dataset:
            # Ground-truth audio present: report synthesis quality
            # (MCD dB + mel Pearson r, the PARITY/BASELINE metrics) of
            # the decoded mels against the true mels — the reference can
            # only produce these numbers by re-training
            # (/root/reference/train_synthesizer.py:363-384).
            from .training.synthesis_trainer import compute_mcd

            true_mels = np.stack(
                [
                    audio_to_mel(
                        a, params.audio_sampling_rate, mel_kwargs=mel_kwargs
                    )
                    for a in dataset["audio"]
                ]
            ).astype(np.float32)
            if true_mels.shape == out["mel"].shape:
                summary["mel_mcd"] = compute_mcd(true_mels, out["mel"])
                summary["mel_pearson_r"] = float(
                    np.corrcoef(
                        out["mel"].ravel(), true_mels.ravel()
                    )[0, 1]
                )
            else:
                print(
                    "WARNING: skipping mel quality metrics — ground-truth "
                    f"mels {true_mels.shape} vs decoded {out['mel'].shape} "
                    "(mel_kwargs mismatch with the training config?)"
                )
        waves = decoder.synthesize_wavs(
            out["mel"], params.audio_sampling_rate, mel_kwargs,
            n=params.n_wavs,
        )
        for i, wave in enumerate(waves):
            write_wav(
                os.path.join(params.output_dir, f"decoded_{i}.wav"),
                np.asarray(wave),
                params.audio_sampling_rate,
            )
        summary["n_wavs"] = len(waves)

    if params.benchmark:
        summary["trial_latency_s"] = _measure_latency(
            decoder, ecog, channel_selections
        )

    with open(os.path.join(params.output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


def segment_windows(
    tones,
    syllables,
    starts,
    window: int,
    sf: float,
    min_windows: int = 3,
) -> list:
    """Group consecutive same-label windows into decoded EVENTS.

    The calibration-free segmentation rule (the classifiers' heads are
    sigmoid/logit outputs, so probability thresholds would be
    uncalibrated): an event is a run of >= ``min_windows`` consecutive
    windows predicting the SAME (tone, syllable) — the same
    consecutive-run idea as the channel-selection significance rule.
    Returns dicts with onset/offset seconds, labels, and run length.
    """
    tones = np.asarray(tones)
    syllables = np.asarray(syllables)
    starts = np.asarray(starts)
    events = []
    i, n = 0, len(starts)
    while i < n:
        j = i
        while (
            j + 1 < n
            and tones[j + 1] == tones[i]
            and syllables[j + 1] == syllables[i]
        ):
            j += 1
        run = j - i + 1
        if run >= max(int(min_windows), 1):
            events.append(
                {
                    "onset_s": round(float(starts[i]) / sf, 6),
                    "offset_s": round((float(starts[j]) + window) / sf, 6),
                    "tone": int(tones[i]),
                    "syllable": int(syllables[i]),
                    "n_windows": int(run),
                }
            )
        i = j + 1
    return events


def _load_recording(path: str):
    """Continuous recording npz -> ((C, T) float32, sampling rate).

    Accepts the preprocess stage's block schema ({data, sf} —
    ``preprocess/io/npz_blocks.save_block``) or a plain {ecog, ecog_sf}.
    """
    archive = np.load(path)
    if "data" in archive:
        rec, sf = archive["data"], archive.get("sf")
    elif "ecog" in archive:
        rec, sf = archive["ecog"], archive.get("ecog_sf")
    else:
        raise KeyError(
            f"{path} has keys {sorted(archive.files)}; a streaming "
            "recording needs 'data'+'sf' (preprocess block npz) or "
            "'ecog'+'ecog_sf'."
        )
    if sf is None:
        raise KeyError(f"{path} carries no sampling rate (sf/ecog_sf).")
    rec = np.asarray(rec, dtype=np.float32)
    if rec.ndim != 2:
        raise ValueError(
            f"streaming recording must be (channels, samples); got "
            f"shape {rec.shape}"
        )
    return rec, float(sf)


def _run_stream(
    params, decoder, recording, sf, window, hop, channel_selections,
    mel_kwargs,
) -> Dict[str, Any]:
    """Streaming decode: windows.csv + mels/wavs + summary.json."""
    from .utils.audio import write_wav

    out = decoder.decode_stream(recording, channel_selections, window, hop)
    starts = out["window_start"]

    os.makedirs(params.output_dir, exist_ok=True)
    rows = [
        {
            "window": i,
            "start_s": round(float(s) / sf, 6),
            "tone_pred": int(out["tone"][i]),
            "syllable_pred": int(out["syllable"][i]),
            "tone_prob": float(np.max(out["tone_probs"][i])),
            "syllable_prob": float(np.max(out["syllable_probs"][i])),
        }
        for i, s in enumerate(starts)
    ]
    csv_path = os.path.join(params.output_dir, "windows.csv")
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)

    # Decoded events: runs of label-stable windows (run-length rule).
    # Always (re)written — a zero-event re-run must not leave a stale
    # events.csv from a previous run beside an n_events=0 summary.
    events = segment_windows(
        out["tone"], out["syllable"], starts, window, sf,
        min_windows=getattr(params, "stream_min_windows", 3),
    )
    with open(
        os.path.join(params.output_dir, "events.csv"), "w", newline=""
    ) as f:
        writer = csv.DictWriter(
            f,
            fieldnames=["onset_s", "offset_s", "tone", "syllable",
                        "n_windows"],
        )
        writer.writeheader()
        writer.writerows(events)

    summary: Dict[str, Any] = {
        "n_windows": len(starts),
        "n_events": len(events),
        "window_s": window / sf,
        "hop_s": hop / sf,
        "recording_s": recording.shape[1] / sf,
    }
    if "mel" in out:
        np.savez(
            os.path.join(params.output_dir, "mels.npz"),
            mel=out["mel"],
            window_start=starts,
            n_mels=np.asarray(mel_kwargs.get("n_mels", 128)),
        )
        waves = decoder.synthesize_wavs(
            out["mel"], params.audio_sampling_rate, mel_kwargs,
            n=params.n_wavs,
        )
        for i, wave in enumerate(waves):
            write_wav(
                os.path.join(params.output_dir, f"decoded_w{i}.wav"),
                np.asarray(wave),
                params.audio_sampling_rate,
            )
        summary["n_wavs"] = len(waves)

    with open(os.path.join(params.output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


def _parse_model_kwargs(value) -> Optional[Dict[str, Any]]:
    """CLI passes a JSON string; --training_dir fills a plain dict."""
    if not value:
        return None
    return value if isinstance(value, dict) else json.loads(value)


def _measure_latency(decoder, ecog, channel_selections, n_runs: int = 20):
    """Single-trial end-to-end decode latency (epochs -> labels [+ mel]),
    median over n_runs; a scalar readback fences each run (the tunneled
    backend's block_until_ready returns early)."""
    one = ecog[:1]
    decoder.decode(one, channel_selections)  # compile
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        out = decoder.decode(one, channel_selections)
        float(out["mel"][0, 0] if "mel" in out else out["tone_probs"][0, 0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main(argv=None) -> None:
    from .runtime.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
