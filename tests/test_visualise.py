"""Smoke tests for the figure toolbox: every plot function must write a
non-empty file headlessly (the reference verifies pipelines by figures,
so a broken plotter silently degrades every stage's observability)."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from decode_tonal_langauge_tpu.utils import visualise


def _written(path):
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_plot_preprocessing_step(tmp_path, rng):
    before = rng.standard_normal((6, 1000)).astype(np.float32)
    after = rng.standard_normal((6, 400)).astype(np.float32)
    out = visualise.plot_preprocessing_step(
        before, 1000.0, after, 400.0, str(tmp_path), 0, "downsample"
    )
    _written(out)


def test_plot_confusion_matrix(tmp_path):
    cm = np.array([[5, 1], [2, 7]])
    path = str(tmp_path / "cm.png")
    visualise.plot_confusion_matrix(cm, label_names=["a", "b"], figure_path=path)
    _written(path)


def test_compare_confusion_matrices(tmp_path):
    cm1 = np.array([[5, 1], [2, 7]])
    cm2 = np.array([[4, 2], [1, 8]])
    path = str(tmp_path / "cmp.png")
    visualise.compare_confusion_matrices(cm1, cm2, figure_path=path)
    _written(path)


def test_plot_psd(tmp_path, rng):
    x = rng.standard_normal((4, 2000)).astype(np.float32)
    path = str(tmp_path / "psd.png")
    visualise.plot_psd(x, 400.0, figure_path=path, fmax=150.0)
    _written(path)


def test_plot_channel_mean_std(tmp_path, rng):
    x = rng.standard_normal((4, 4000)).astype(np.float32)
    path = str(tmp_path / "ms.png")
    visualise.plot_channel_mean_std(x, 400.0, figure_path=path)
    _written(path)


def test_plot_channel_venn(tmp_path):
    path = str(tmp_path / "venn.png")
    visualise.plot_channel_venn_diagram(
        {"active": {1, 2, 3, 4}, "tone": {2, 3}, "syllable": {3, 4, 5}},
        figure_path=path,
    )
    _written(path)


def test_plot_channel_venn_needs_three_sets(tmp_path):
    with pytest.raises(ValueError):
        visualise.plot_channel_venn_diagram({"a": {1}, "b": {2}})


def test_plot_metric(tmp_path):
    rows = [
        {"subject": 1, "accuracy_mean": 0.8, "accuracy_std": 0.05,
         "model_size": 1000, "model_name": "logistic"},
        {"subject": 2, "accuracy_mean": 0.7, "accuracy_std": 0.1,
         "model_size": 100000, "model_name": "cnn"},
    ]
    path = str(tmp_path / "metric.png")
    visualise.plot_metric(rows, "accuracy", chance_level=0.25, figure_path=path)
    _written(path)


def test_plot_training_losses(tmp_path):
    hist = [(1.0, 9.0), (0.5, 7.0), (0.3, 6.0)]
    path = str(tmp_path / "losses.png")
    visualise.plot_training_losses(hist, figure_path=path)
    _written(path)


def test_audio_figures(tmp_path, rng):
    from decode_tonal_langauge_tpu.utils.audio import compare_mels, visualise_mel

    mel = rng.standard_normal((32, 20)).astype(np.float32)
    p1 = str(tmp_path / "mel.png")
    visualise_mel(mel, audio_sampling_rate=8000, file_path=p1)
    _written(p1)
    p2 = str(tmp_path / "mels.png")
    compare_mels(mel, mel + 0.1, audio_sampling_rate=8000, file_path=p2)
    _written(p2)
