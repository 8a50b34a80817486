"""Serving-path tests: checkpoints -> TonalDecoder -> labels + mels + wavs.

Covers the end-to-end inference module (``serving.py``), which the
reference lacks entirely (its evaluation only exists inside
``/root/reference/train_synthesizer.py:363-445``).
"""

import json
import os

import jax
import numpy as np
import pytest

from decode_tonal_langauge_tpu.runtime.checkpoint import save_params
from decode_tonal_langauge_tpu.serving import (
    TonalDecoder,
    build_parser,
    load_decoder,
    run,
)
from decode_tonal_langauge_tpu.training.train_synthesizer import (
    build_classifier,
    build_synthesis_model,
)
from decode_tonal_langauge_tpu.utils.audio import audio_to_mel

N_TRIALS, N_CH, T = 10, 6, 24
N_TONES, N_SYLLS = 3, 2
CHANNELS = {
    "active_channels": [0, 1, 2, 3, 4, 5],
    "tone_discriminative": [0, 1],
    "syllable_discriminative": [2, 3],
}
MAPPING = {"0": [0.1, 0.2, 0.3], "1": [0.4, 0.5, 0.6], "2": [0.7, 0.8, 0.9]}
MEL_KWARGS = {"n_mels": 8, "n_fft": 64, "hop_length": 32}
SR = 800


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving")
    rng = np.random.default_rng(0)

    ecog = rng.standard_normal((N_TRIALS, N_CH, T)).astype(np.float32)
    audio = rng.standard_normal((N_TRIALS, SR // 2)).astype(np.float32)
    tones = rng.integers(0, N_TONES, N_TRIALS)
    sylls = rng.integers(0, N_SYLLS, N_TRIALS)
    sample_path = os.path.join(root, "samples.npz")
    np.savez(sample_path, ecog=ecog, audio=audio, tone=tones, syllable=sylls)

    channel_file = os.path.join(root, "channels.json")
    with open(channel_file, "w") as f:
        json.dump(CHANNELS, f)
    config_file = os.path.join(root, "config.json")
    with open(config_file, "w") as f:
        json.dump(
            {
                "tone_dynamic_mapping": MAPPING,
                "n_tones": N_TONES,
                "n_syllables": N_SYLLS,
                "mel_kwargs": MEL_KWARGS,
            },
            f,
        )

    # Random-initialised (untrained) models, checkpointed.
    def ckpt(model, path, example):
        variables = model.init(
            {"params": jax.random.key(0)}, example, train=False
        )
        save_params(os.path.join(root, path), variables)
        return variables

    tone_model = build_classifier("logistic", N_TONES, 2, T)
    tone_vars = ckpt(tone_model, "tone_ckpt", ecog[:, :2, :])
    syll_model = build_classifier("ShallowNN", N_SYLLS, 2, T)
    syll_vars = ckpt(syll_model, "syll_ckpt", ecog[:, 2:4, :])

    mel = audio_to_mel(audio[0], SR, mel_kwargs=MEL_KWARGS)
    mel_dim = int(np.prod(mel.shape))
    synth_model = build_synthesis_model("SynthesisLite", mel_dim, 2, T)
    labels0 = np.zeros((1, 2, 3), dtype=np.float32)
    synth_vars = synth_model.init(
        {"params": jax.random.key(1)}, ecog[:1, 4:6, :], labels0, train=False
    )
    save_params(os.path.join(root, "synth_ckpt"), synth_vars)

    return {
        "root": str(root),
        "sample_path": sample_path,
        "channel_file": channel_file,
        "config_file": config_file,
        "ecog": ecog,
        "tones": tones,
        "sylls": sylls,
        "models": (tone_model, tone_vars, syll_model, syll_vars,
                   synth_model, synth_vars),
        "mel_dim": mel_dim,
        "mel_shape": mel.shape,
    }


def test_decoder_matches_direct_apply(artifacts):
    tone_model, tone_vars, syll_model, syll_vars, synth_model, synth_vars = (
        artifacts["models"]
    )
    dec = TonalDecoder(
        tone_model, tone_vars, syll_model, syll_vars, MAPPING,
        synthesis_model=synth_model, synthesis_variables=synth_vars,
    )
    out = dec.decode(artifacts["ecog"], CHANNELS)

    ref_tone = np.argmax(
        tone_model.apply(tone_vars, artifacts["ecog"][:, :2, :], train=False),
        axis=1,
    )
    np.testing.assert_array_equal(out["tone"], ref_tone)
    assert out["mel"].shape == (N_TRIALS, artifacts["mel_dim"])

    # Mels must match feeding the predicted dynamics by hand.
    table = np.zeros((N_TONES, 3), dtype=np.float32)
    for k, v in MAPPING.items():
        table[int(k)] = v
    dyn = np.stack(
        [
            np.broadcast_to(
                out["syllable"][:, None].astype(np.float32), (N_TRIALS, 3)
            ),
            table[out["tone"]],
        ],
        axis=1,
    )
    ref_mel = synth_model.apply(
        synth_vars, artifacts["ecog"][:, 4:6, :], dyn, train=False
    )
    np.testing.assert_allclose(out["mel"], np.asarray(ref_mel),
                               rtol=1e-4, atol=1e-5)


def test_load_decoder_roundtrips_checkpoints(artifacts):
    with open(artifacts["config_file"]) as f:
        config = json.load(f)
    dec = load_decoder(
        CHANNELS, config, T,
        "logistic", os.path.join(artifacts["root"], "tone_ckpt"),
        "ShallowNN", os.path.join(artifacts["root"], "syll_ckpt"),
        synthesis_model_name="SynthesisLite",
        synthesis_model_path=os.path.join(artifacts["root"], "synth_ckpt"),
        mel_dim=artifacts["mel_dim"],
    )
    out = dec.decode(artifacts["ecog"], CHANNELS)
    tone_model, tone_vars = artifacts["models"][:2]
    ref_tone = np.argmax(
        tone_model.apply(tone_vars, artifacts["ecog"][:, :2, :], train=False),
        axis=1,
    )
    np.testing.assert_array_equal(out["tone"], ref_tone)


def test_cli_run_writes_outputs(artifacts, tmp_path):
    out_dir = str(tmp_path / "decoded")
    args = build_parser().parse_args([
        "--sample_path", artifacts["sample_path"],
        "--channel_file", artifacts["channel_file"],
        "--config_file", artifacts["config_file"],
        "--tone_model_name", "logistic",
        "--tone_model_path", os.path.join(artifacts["root"], "tone_ckpt"),
        "--syllable_model_name", "ShallowNN",
        "--syllable_model_path", os.path.join(artifacts["root"], "syll_ckpt"),
        "--synthesis_model_name", "SynthesisLite",
        "--synthesis_model_path", os.path.join(artifacts["root"], "synth_ckpt"),
        "--audio_sampling_rate", str(SR),
        "--output_dir", out_dir,
        "--n_wavs", "2",
        "--benchmark",
    ])
    summary = run(args)

    assert os.path.exists(os.path.join(out_dir, "predictions.csv"))
    assert os.path.exists(os.path.join(out_dir, "mels.npz"))
    assert os.path.exists(os.path.join(out_dir, "decoded_0.wav"))
    assert os.path.exists(os.path.join(out_dir, "decoded_1.wav"))
    assert summary["n_trials"] == N_TRIALS
    assert 0.0 <= summary["tone_accuracy"] <= 1.0
    assert summary["trial_latency_s"] > 0
    # ground-truth audio in the npz -> synthesis quality metrics
    assert summary["mel_mcd"] > 0.0
    assert -1.0 <= summary["mel_pearson_r"] <= 1.0

    import csv as _csv

    with open(os.path.join(out_dir, "predictions.csv")) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == N_TRIALS
    assert {"trial", "tone_pred", "syllable_pred", "tone_true",
            "syllable_true"} <= set(rows[0].keys())


def test_scaler_rides_checkpoint_and_is_applied(artifacts, tmp_path):
    """Classifiers trained under standardize: true save the train-split
    (mu, sd); serving must reproduce that scaling — raw features through
    a standardized-trained classifier decode at chance (the exact bug
    this guards against)."""
    from argparse import Namespace

    from decode_tonal_langauge_tpu.training.classifier_pipeline import (
        _maybe_save_checkpoint,
    )

    tone_model, tone_vars = artifacts["models"][:2]
    rng = np.random.default_rng(7)
    mu = rng.standard_normal((1, 2, T)).astype(np.float32) * 3
    sd = (rng.random((1, 2, T)).astype(np.float32) + 0.5) * 2

    log_dir = str(tmp_path / "ckpt_logs")
    ns = Namespace(
        save_checkpoints=True, log_dir=log_dir, model_name="logistic"
    )
    _maybe_save_checkpoint(ns, dict(tone_vars), "tone", 0, scaler=(mu, sd))
    path = os.path.join(log_dir, "model_checkpoints", "tone_logistic_seed_0")

    with open(artifacts["config_file"]) as f:
        config = json.load(f)
    dec = load_decoder(
        CHANNELS, config, T,
        "logistic", path,
        "ShallowNN", os.path.join(artifacts["root"], "syll_ckpt"),
    )
    assert dec.tone_scaler is not None
    out = dec.decode(artifacts["ecog"], CHANNELS)

    scaled = (artifacts["ecog"][:, :2, :] - mu) / sd
    ref = np.argmax(
        tone_model.apply(tone_vars, scaled, train=False), axis=1
    )
    np.testing.assert_array_equal(out["tone"], ref)


def test_synthesis_trainer_applies_frozen_scaler(artifacts):
    """SynthesisTrainer standardizes frozen-classifier inputs when the
    checkpoint carries a scaler (predictions must match hand-scaling)."""
    import jax.numpy as jnp

    from decode_tonal_langauge_tpu.training.synthesis_trainer import (
        SynthesisTrainer,
    )

    tone_model, tone_vars, syll_model, syll_vars, synth_model, _ = (
        artifacts["models"]
    )
    rng = np.random.default_rng(9)
    mu = rng.standard_normal((1, 2, T)).astype(np.float32)
    sd = (rng.random((1, 2, T)).astype(np.float32) + 0.5)
    scaler = (jnp.asarray(mu), jnp.asarray(sd))

    def dyn(trainer, x_tone, x_syll):
        return np.asarray(trainer._predict_labels(x_tone, x_syll))

    kwargs = dict(verbose=False)
    base = SynthesisTrainer(
        synth_model, tone_model, tone_vars, syll_model, syll_vars,
        MAPPING, **kwargs,
    )
    scaled = SynthesisTrainer(
        synth_model, tone_model, tone_vars, syll_model, syll_vars,
        MAPPING, tone_scaler=scaler, syllable_scaler=scaler, **kwargs,
    )
    x_t = artifacts["ecog"][:, :2, :]
    x_s = artifacts["ecog"][:, 2:4, :]
    np.testing.assert_allclose(
        dyn(scaled, x_t, x_s),
        dyn(base, (x_t - mu) / sd, (x_s - mu) / sd),
        rtol=1e-5, atol=1e-6,
    )


def test_synthesizer_checkpoint_roundtrip(artifacts, tmp_path):
    """train_synthesizer --checkpoint_dir (seed-parallel branch) saves
    per-seed synthesizers the serving module can load and run."""
    from decode_tonal_langauge_tpu.training import train_synthesizer

    ckpt_dir = str(tmp_path / "ckpts")
    args = train_synthesizer.build_parser().parse_args([
        "--sample_path", artifacts["sample_path"],
        "--subject_id", "1",
        "--result_file", str(tmp_path / "results.csv"),
        "--channel_file", artifacts["channel_file"],
        "--config_file", artifacts["config_file"],
        "--model_name", "lite_serving_test",
        "--synthesis_model_name", "SynthesisLite",
        "--syllable_model_name", "ShallowNN",
        "--tone_model_name", "logistic",
        "--epochs", "2",
        "--batch_size", "4",
        "--repeat", "2",
        "--verbose", "0",
        "--audio_sampling_rate", str(SR),
        "--checkpoint_dir", ckpt_dir,
    ])
    train_synthesizer.run(args)

    ckpts = sorted(os.listdir(ckpt_dir))
    assert len(ckpts) == 2 and all("SynthesisLite_seed_" in c for c in ckpts)

    with open(artifacts["config_file"]) as f:
        config = json.load(f)
    dec = load_decoder(
        CHANNELS, config, T,
        "logistic", os.path.join(artifacts["root"], "tone_ckpt"),
        "ShallowNN", os.path.join(artifacts["root"], "syll_ckpt"),
        synthesis_model_name="SynthesisLite",
        synthesis_model_path=os.path.join(ckpt_dir, ckpts[0]),
        mel_dim=artifacts["mel_dim"],
    )
    out = dec.decode(artifacts["ecog"], CHANNELS)
    assert out["mel"].shape == (N_TRIALS, artifacts["mel_dim"])
    assert np.all(np.isfinite(out["mel"]))


def test_mesh_decode_matches_single_device(artifacts):
    """Batch sharded over an 8-device `data` mesh must decode exactly
    like the unsharded path (incl. the pad-and-strip for N % dp != 0 —
    N_TRIALS=10 over 8 devices pads by 6)."""
    from decode_tonal_langauge_tpu.parallel.mesh import make_mesh

    tone_model, tone_vars, syll_model, syll_vars, synth_model, synth_vars = (
        artifacts["models"]
    )

    def decode(mesh):
        dec = TonalDecoder(
            tone_model, tone_vars, syll_model, syll_vars, MAPPING,
            synthesis_model=synth_model, synthesis_variables=synth_vars,
            mesh=mesh,
        )
        return dec.decode(artifacts["ecog"], CHANNELS)

    single = decode(None)
    sharded = decode(make_mesh(8, axis_names=("data",)))
    np.testing.assert_array_equal(single["tone"], sharded["tone"])
    np.testing.assert_array_equal(single["syllable"], sharded["syllable"])
    np.testing.assert_allclose(single["mel"], sharded["mel"],
                               rtol=1e-5, atol=1e-5)
    assert sharded["mel"].shape[0] == N_TRIALS


def test_cli_parallel_data_flag(artifacts, tmp_path):
    """--parallel_data N builds the mesh through the CLI path and the
    summary matches the single-device run."""
    def decode(extra, sub):
        out_dir = str(tmp_path / sub)
        args = build_parser().parse_args([
            "--sample_path", artifacts["sample_path"],
            "--channel_file", artifacts["channel_file"],
            "--config_file", artifacts["config_file"],
            "--tone_model_name", "logistic",
            "--tone_model_path", os.path.join(artifacts["root"], "tone_ckpt"),
            "--syllable_model_name", "ShallowNN",
            "--syllable_model_path", os.path.join(artifacts["root"], "syll_ckpt"),
            "--output_dir", out_dir,
        ] + extra)
        return run(args), out_dir

    single, d1 = decode([], "single")
    sharded, d2 = decode(["--parallel_data", "8"], "sharded")
    assert single["tone_accuracy"] == sharded["tone_accuracy"]
    assert single["syllable_accuracy"] == sharded["syllable_accuracy"]
    import csv as _csv

    rows1 = list(_csv.DictReader(open(os.path.join(d1, "predictions.csv"))))
    rows2 = list(_csv.DictReader(open(os.path.join(d2, "predictions.csv"))))
    assert rows1 == rows2


def test_unsorted_channel_file_matches_sorted(artifacts):
    """Training sorts channel subsets (sample handler); serving must
    decode identically for a hand-written unsorted channel file."""
    tone_model, tone_vars, syll_model, syll_vars = artifacts["models"][:4]
    dec = TonalDecoder(tone_model, tone_vars, syll_model, syll_vars, MAPPING)
    shuffled = dict(CHANNELS)
    shuffled["tone_discriminative"] = [1, 0]
    shuffled["syllable_discriminative"] = [3, 2]
    out_sorted = dec.decode(artifacts["ecog"], CHANNELS)
    out_shuffled = dec.decode(artifacts["ecog"], shuffled)
    np.testing.assert_array_equal(out_sorted["tone"], out_shuffled["tone"])
    np.testing.assert_array_equal(
        out_sorted["syllable"], out_shuffled["syllable"]
    )


def test_model_kwargs_reach_the_factory(artifacts):
    """Custom training-time model kwargs (e.g. a non-default hidden
    size) must be reproducible at serving time."""
    from decode_tonal_langauge_tpu.serving import _build_classifier

    model = _build_classifier(
        "ShallowNN", N_TONES, 2, T, model_kwargs={"hidden_dim": 7}
    )
    assert model.hidden_dim == 7


def test_synthesis_name_without_path_rejected(artifacts):
    with open(artifacts["config_file"]) as f:
        config = json.load(f)
    with pytest.raises(ValueError, match="together"):
        load_decoder(
            CHANNELS, config, T,
            "logistic", os.path.join(artifacts["root"], "tone_ckpt"),
            "ShallowNN", os.path.join(artifacts["root"], "syll_ckpt"),
            synthesis_model_name="SynthesisLite",
            synthesis_model_path=None,
        )


def test_classifier_only_without_mel_kwargs(artifacts, tmp_path):
    """Classifier-only decode must not require mel_kwargs in the config."""
    config_file = str(tmp_path / "minimal_config.json")
    with open(config_file, "w") as f:
        json.dump(
            {
                "tone_dynamic_mapping": MAPPING,
                "n_tones": N_TONES,
                "n_syllables": N_SYLLS,
            },
            f,
        )
    out_dir = str(tmp_path / "labels")
    args = build_parser().parse_args([
        "--sample_path", artifacts["sample_path"],
        "--channel_file", artifacts["channel_file"],
        "--config_file", config_file,
        "--tone_model_name", "logistic",
        "--tone_model_path", os.path.join(artifacts["root"], "tone_ckpt"),
        "--syllable_model_name", "ShallowNN",
        "--syllable_model_path", os.path.join(artifacts["root"], "syll_ckpt"),
        "--output_dir", out_dir,
    ])
    summary = run(args)
    assert summary["n_trials"] == N_TRIALS


def test_synthesis_serving_without_audio(artifacts, tmp_path):
    """The primary serving use case: NEW ECoG epochs carry no
    ground-truth audio — the synthesizer's output dim must come from the
    checkpoint's head-bias shape, not an audio probe (ADVICE r3)."""
    dataset = np.load(artifacts["sample_path"])
    sample_path = str(tmp_path / "new_epochs.npz")
    np.savez(sample_path, ecog=dataset["ecog"])  # ecog only

    out_dir = str(tmp_path / "decoded_new")
    args = build_parser().parse_args([
        "--sample_path", sample_path,
        "--channel_file", artifacts["channel_file"],
        "--config_file", artifacts["config_file"],
        "--tone_model_name", "logistic",
        "--tone_model_path", os.path.join(artifacts["root"], "tone_ckpt"),
        "--syllable_model_name", "ShallowNN",
        "--syllable_model_path", os.path.join(artifacts["root"], "syll_ckpt"),
        "--synthesis_model_name", "SynthesisLite",
        "--synthesis_model_path", os.path.join(artifacts["root"], "synth_ckpt"),
        "--audio_sampling_rate", str(SR),
        "--output_dir", out_dir,
        "--n_wavs", "1",
    ])
    summary = run(args)
    assert summary["n_trials"] == N_TRIALS
    assert "tone_accuracy" not in summary  # no true labels in the npz
    mels = np.load(os.path.join(out_dir, "mels.npz"))["mel"]
    assert mels.shape == (N_TRIALS, artifacts["mel_dim"])
    assert os.path.exists(os.path.join(out_dir, "decoded_0.wav"))


def test_mel_dim_from_checkpoint(artifacts):
    from decode_tonal_langauge_tpu.runtime.checkpoint import load_params
    from decode_tonal_langauge_tpu.serving import _mel_dim_from_variables

    restored = load_params(os.path.join(artifacts["root"], "synth_ckpt"))
    assert _mel_dim_from_variables(restored) == artifacts["mel_dim"]


def test_zero_trial_decode_rejected(artifacts):
    tone_model, tone_vars, syll_model, syll_vars = artifacts["models"][:4]
    dec = TonalDecoder(tone_model, tone_vars, syll_model, syll_vars, MAPPING)
    empty = np.zeros((0, N_CH, T), dtype=np.float32)
    with pytest.raises(ValueError, match="zero trials"):
        dec.decode(empty, CHANNELS)


def test_classifier_only_decode(artifacts, tmp_path):
    out_dir = str(tmp_path / "labels_only")
    args = build_parser().parse_args([
        "--sample_path", artifacts["sample_path"],
        "--channel_file", artifacts["channel_file"],
        "--config_file", artifacts["config_file"],
        "--tone_model_name", "logistic",
        "--tone_model_path", os.path.join(artifacts["root"], "tone_ckpt"),
        "--syllable_model_name", "ShallowNN",
        "--syllable_model_path", os.path.join(artifacts["root"], "syll_ckpt"),
        "--output_dir", out_dir,
    ])
    summary = run(args)
    assert "n_wavs" not in summary
    assert not os.path.exists(os.path.join(out_dir, "mels.npz"))
    assert os.path.exists(os.path.join(out_dir, "predictions.csv"))


def test_missing_model_flags_without_training_dir(artifacts, tmp_path):
    args = build_parser().parse_args(
        [
            "--sample_path", artifacts["sample_path"],
            "--channel_file", artifacts["channel_file"],
            "--config_file", artifacts["config_file"],
            "--output_dir", str(tmp_path / "out"),
        ]
    )
    with pytest.raises(ValueError, match="--tone_model_name"):
        run(args)


def test_training_dir_requires_provenance(artifacts, tmp_path):
    args = build_parser().parse_args(
        [
            "--sample_path", artifacts["sample_path"],
            "--training_dir", str(tmp_path),  # no config.yaml here
            "--output_dir", str(tmp_path / "out"),
        ]
    )
    with pytest.raises(FileNotFoundError, match="config.yaml"):
        run(args)


def test_training_dir_conflicts_with_explicit_flags(artifacts, tmp_path):
    args = build_parser().parse_args(
        [
            "--sample_path", artifacts["sample_path"],
            "--training_dir", str(tmp_path),
            "--tone_model_name", "logistic",
            "--output_dir", str(tmp_path / "out"),
        ]
    )
    with pytest.raises(ValueError, match="silently override"):
        run(args)


def test_decode_stream_matches_epoch_decode(artifacts):
    """Sliding-window streaming decode: each window's outputs must equal
    decoding the same slice as an epoch (one batched dispatch, windows
    gathered on device)."""
    tone_model, tone_vars, syll_model, syll_vars, synth_model, synth_vars = (
        artifacts["models"]
    )
    dec = TonalDecoder(
        tone_model, tone_vars, syll_model, syll_vars, MAPPING,
        synthesis_model=synth_model, synthesis_variables=synth_vars,
    )
    rng = np.random.default_rng(5)
    recording = rng.standard_normal((N_CH, 200)).astype(np.float32)
    hop = 16
    out = dec.decode_stream(recording, CHANNELS, window=T, hop=hop)

    n_expected = (200 - T) // hop + 1
    assert len(out["window_start"]) == n_expected
    np.testing.assert_array_equal(
        out["window_start"], np.arange(0, 200 - T + 1, hop)
    )
    epochs = np.stack(
        [recording[:, s : s + T] for s in out["window_start"]]
    )
    ref = dec.decode(epochs, CHANNELS)
    np.testing.assert_array_equal(out["tone"], ref["tone"])
    np.testing.assert_array_equal(out["syllable"], ref["syllable"])
    np.testing.assert_allclose(out["mel"], ref["mel"], rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="exceeds the recording"):
        dec.decode_stream(recording[:, :10], CHANNELS, window=T, hop=hop)
    with pytest.raises(ValueError, match="channels, samples"):
        dec.decode_stream(epochs, CHANNELS, window=T, hop=hop)


def test_cli_streaming_mode(artifacts, tmp_path):
    """--stream_recording end to end: block-npz recording in, windows.csv
    + mels + wavs + summary out."""
    sf = 100.0
    rng = np.random.default_rng(6)
    rec_path = str(tmp_path / "B1_ecog.npz")
    np.savez(
        rec_path,
        data=rng.standard_normal((N_CH, 300)).astype(np.float32),
        sf=sf,
    )
    out_dir = str(tmp_path / "streamed")
    args = build_parser().parse_args([
        "--stream_recording", rec_path,
        "--stream_window_s", str(T / sf),
        "--stream_hop_s", str(32 / sf),
        "--channel_file", artifacts["channel_file"],
        "--config_file", artifacts["config_file"],
        "--tone_model_name", "logistic",
        "--tone_model_path", os.path.join(artifacts["root"], "tone_ckpt"),
        "--syllable_model_name", "ShallowNN",
        "--syllable_model_path", os.path.join(artifacts["root"], "syll_ckpt"),
        "--synthesis_model_name", "SynthesisLite",
        "--synthesis_model_path", os.path.join(artifacts["root"], "synth_ckpt"),
        "--audio_sampling_rate", str(SR),
        "--output_dir", out_dir,
        "--n_wavs", "1",
    ])
    summary = run(args)

    n_expected = (300 - T) // 32 + 1
    assert summary["n_windows"] == n_expected
    assert summary["n_events"] >= 0  # events.csv schema is exercised
    assert summary["window_s"] == pytest.approx(T / sf)
    assert summary["recording_s"] == pytest.approx(3.0)
    assert os.path.exists(os.path.join(out_dir, "windows.csv"))
    assert os.path.exists(os.path.join(out_dir, "mels.npz"))
    assert os.path.exists(os.path.join(out_dir, "decoded_w0.wav"))

    import csv as _csv

    with open(os.path.join(out_dir, "windows.csv")) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == n_expected
    assert float(rows[1]["start_s"]) == pytest.approx(32 / sf)
    mels = np.load(os.path.join(out_dir, "mels.npz"))
    assert mels["mel"].shape[0] == n_expected


def test_cli_stream_requires_window_and_excludes_sample_path(
    artifacts, tmp_path
):
    rec_path = str(tmp_path / "rec.npz")
    np.savez(rec_path, data=np.zeros((N_CH, 100), np.float32), sf=100.0)
    base = [
        "--channel_file", artifacts["channel_file"],
        "--config_file", artifacts["config_file"],
        "--tone_model_name", "logistic",
        "--tone_model_path", os.path.join(artifacts["root"], "tone_ckpt"),
        "--syllable_model_name", "ShallowNN",
        "--syllable_model_path", os.path.join(artifacts["root"], "syll_ckpt"),
        "--output_dir", str(tmp_path / "o"),
    ]
    with pytest.raises(ValueError, match="stream_window_s"):
        run(build_parser().parse_args(
            ["--stream_recording", rec_path] + base
        ))
    with pytest.raises(ValueError, match="not both"):
        run(build_parser().parse_args(
            ["--stream_recording", rec_path, "--stream_window_s", "0.24",
             "--sample_path", artifacts["sample_path"]] + base
        ))
    with pytest.raises(ValueError, match="required"):
        run(build_parser().parse_args(base))


def test_segment_windows_run_length_rule():
    """Events = runs of >= min_windows label-stable windows; shorter
    runs (spurious flips) are dropped; boundaries in seconds."""
    from decode_tonal_langauge_tpu.serving import segment_windows

    sf, window, hop = 100.0, 40, 10
    tones = np.array([1, 1, 1, 2, 1, 3, 3, 3, 3, 0])
    sylls = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1])
    starts = np.arange(10) * hop
    events = segment_windows(tones, sylls, starts, window, sf, min_windows=3)

    assert len(events) == 2
    first, second = events
    assert (first["tone"], first["syllable"], first["n_windows"]) == (1, 0, 3)
    assert first["onset_s"] == pytest.approx(0.0)
    assert first["offset_s"] == pytest.approx((20 + window) / sf)
    assert (second["tone"], second["syllable"], second["n_windows"]) == (3, 1, 4)
    assert second["onset_s"] == pytest.approx(50 / sf)
    assert second["offset_s"] == pytest.approx((80 + window) / sf)

    # min_windows=1 keeps every run, including the single-window flips
    assert len(
        segment_windows(tones, sylls, starts, window, sf, min_windows=1)
    ) == 5
    assert segment_windows([], [], [], window, sf) == []


def test_decode_stream_chunked_matches_single_batch(artifacts):
    """max_batch chunking (device-memory guard for long recordings) must
    not change any output."""
    tone_model, tone_vars, syll_model, syll_vars, _, _ = artifacts["models"]
    dec = TonalDecoder(tone_model, tone_vars, syll_model, syll_vars, MAPPING)
    rng = np.random.default_rng(7)
    recording = rng.standard_normal((N_CH, 400)).astype(np.float32)

    full = dec.decode_stream(recording, CHANNELS, window=T, hop=8)
    chunked = dec.decode_stream(
        recording, CHANNELS, window=T, hop=8, max_batch=7
    )
    assert len(full["window_start"]) > 14  # several chunks exercised
    for k in full:
        np.testing.assert_array_equal(full[k], chunked[k])


def test_honor_jax_platforms_env(monkeypatch):
    """CLI platform pin: mirrors JAX_PLATFORMS into jax.config (a
    sitecustomize-registered backend can ignore the env var and hang a
    dead tunnel); no env var -> config untouched; idempotent."""
    from decode_tonal_langauge_tpu.runtime.platform import (
        honor_jax_platforms_env,
    )

    before = jax.config.jax_platforms
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    honor_jax_platforms_env()
    assert jax.config.jax_platforms == before

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    honor_jax_platforms_env()
    honor_jax_platforms_env()  # idempotent
    assert jax.config.jax_platforms == "cpu"


def test_stream_window_validated_against_provenance(artifacts, tmp_path):
    """With --training_dir, the streaming window is checked against the
    run's sample_length: a mismatched window restores cleanly into the
    models and would decode silently wrong."""
    rec_path = str(tmp_path / "rec.npz")
    np.savez(rec_path, data=np.zeros((N_CH, 200), np.float32), sf=100.0)
    args = build_parser().parse_args([
        "--stream_recording", rec_path,
        "--stream_window_s", "0.3",
        "--channel_file", artifacts["channel_file"],
        "--config_file", artifacts["config_file"],
        "--tone_model_name", "logistic",
        "--tone_model_path", os.path.join(artifacts["root"], "tone_ckpt"),
        "--syllable_model_name", "ShallowNN",
        "--syllable_model_path", os.path.join(artifacts["root"], "syll_ckpt"),
        "--output_dir", str(tmp_path / "o"),
    ])
    # what _configure_from_training_dir stashes from provenance
    args._provenance_sample_length = 0.4
    with pytest.raises(ValueError, match="sample_length"):
        run(args)


def test_stream_zero_events_overwrites_stale_events_csv(artifacts, tmp_path):
    """events.csv is always rewritten: a zero-event re-run must not
    leave a previous run's events beside an n_events summary of 0."""
    import csv as _csv

    out_dir = tmp_path / "o"
    out_dir.mkdir()
    (out_dir / "events.csv").write_text(
        "onset_s,offset_s,tone,syllable,n_windows\n0.0,0.4,1,0,5\n"
    )
    rng = np.random.default_rng(8)
    rec_path = str(tmp_path / "rec.npz")
    np.savez(
        rec_path,
        data=rng.standard_normal((N_CH, 120)).astype(np.float32),
        sf=100.0,
    )
    args = build_parser().parse_args([
        "--stream_recording", rec_path,
        "--stream_window_s", str(T / 100.0),
        "--stream_hop_s", "0.24",
        "--stream_min_windows", "1000",  # nothing can qualify
        "--channel_file", artifacts["channel_file"],
        "--config_file", artifacts["config_file"],
        "--tone_model_name", "logistic",
        "--tone_model_path", os.path.join(artifacts["root"], "tone_ckpt"),
        "--syllable_model_name", "ShallowNN",
        "--syllable_model_path", os.path.join(artifacts["root"], "syll_ckpt"),
        "--output_dir", str(out_dir),
    ])
    summary = run(args)
    assert summary["n_events"] == 0
    with open(out_dir / "events.csv") as f:
        assert list(_csv.DictReader(f)) == []  # stale rows gone
