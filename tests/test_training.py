"""Training-stack tests: trainer convergence, splits, metrics, sample
handler, and the full classifier stage on synthetic samples."""

import os
from argparse import Namespace

import numpy as np
import pytest

from decode_tonal_langauge_tpu.data.sample_loading import ClassificationSampleHandler
from decode_tonal_langauge_tpu.data.splits import split_indices
from decode_tonal_langauge_tpu.models import LogisticRegressionClassifier
from decode_tonal_langauge_tpu.training.trainer import ClassifierTrainer
from decode_tonal_langauge_tpu.utils.metrics import (
    compute_classification_metrics,
    compute_classification_metrics_joint,
)


def _separable_data(rng, n=200, c=4, t=20, n_classes=3):
    y = rng.integers(0, n_classes, n).astype(np.int32)
    x = rng.standard_normal((n, c, t)).astype(np.float32)
    for k in range(n_classes):
        x[y == k, k % c, :] += 3.0
    return x, y


class TestSplits:
    def test_sizes(self):
        tr, va, te = split_indices(100, [0.7, 0.1, 0.2], seed=0)
        assert len(tr) == 70 and len(va) == 10 and len(te) == 20
        assert len(set(tr) | set(va) | set(te)) == 100

    def test_seed_determinism(self):
        a = split_indices(50, [0.5, 0.5], seed=3)
        b = split_indices(50, [0.5, 0.5], seed=3)
        np.testing.assert_array_equal(a[0], b[0])

    def test_invalid_ratio(self):
        with pytest.raises(ValueError):
            split_indices(10, [0.0, 1.0], seed=0)

    def test_ratio_sum_over_one(self):
        # ratios summing past 1 used to silently produce a negative-sized
        # (empty) last split — the reference's dataloaders.py:39-43 bug.
        with pytest.raises(ValueError, match="sum"):
            split_indices(100, [0.7, 0.2, 0.2], seed=0)


class TestMetrics:
    def test_named_metrics(self):
        true = np.array([0, 1, 2, 0, 1, 2])
        preds = np.array([0, 1, 2, 0, 1, 1])
        out = compute_classification_metrics(
            true, preds, ["accuracy", "f1_score", "cohen_kappa", "confusion_matrix"]
        )
        assert out["accuracy"] == pytest.approx(5 / 6)
        assert out["confusion_matrix"].shape == (3, 3)

    def test_generic_sklearn_fallback(self):
        true, preds = np.array([0, 1, 1]), np.array([0, 1, 0])
        out = compute_classification_metrics(true, preds, ["balanced_accuracy_score"])
        assert 0 < out["balanced_accuracy_score"] <= 1

    def test_unknown_metric(self):
        with pytest.raises(ValueError):
            compute_classification_metrics(np.array([0]), np.array([0]), ["nope"])

    def test_joint_metrics_mixed_radix(self):
        all_true = {"syllable": np.array([0, 1, 0, 1]), "tone": np.array([0, 1, 2, 3])}
        all_preds = {"syllable": np.array([0, 1, 0, 0]), "tone": np.array([0, 1, 2, 3])}
        out = compute_classification_metrics_joint(all_true, all_preds, ["accuracy"])
        assert out["accuracy"] == pytest.approx(3 / 4)

    def test_joint_key_mismatch(self):
        with pytest.raises(ValueError):
            compute_classification_metrics_joint(
                {"a": np.array([0])}, {"b": np.array([0])}
            )


class TestSampleHandler:
    @pytest.fixture
    def sample_npz(self, tmp_path, rng):
        n = 24
        path = tmp_path / "subject_1.npz"
        np.savez(
            path,
            ecog=rng.standard_normal((n, 6, 10)).astype(np.float32),
            ecog_sf=100.0,
            syllable=np.tile([0, 1], 12),
            tone=np.tile([0, 1, 2, 3], 6),
        )
        return str(path)

    def test_single_target(self, sample_npz):
        handler = ClassificationSampleHandler(
            Namespace(sample_path=sample_npz, targets="tone", features="ecog")
        )
        data = handler.load_data()
        assert data["features"].shape == (24, 6, 10)
        assert data["n_classes_dict"] == {"tone": 4}
        np.testing.assert_array_equal(data["selected_channels"], np.arange(6))

    def test_multi_target_label_combine(self, sample_npz):
        handler = ClassificationSampleHandler(
            Namespace(
                sample_path=sample_npz, targets=["syllable", "tone"], features="ecog"
            )
        )
        data = handler.load_data()
        # label = syllable + tone * 2 (first-target-minor mixed radix)
        expected = np.tile([0, 1], 12) + np.tile([0, 1, 2, 3], 6) * 2
        np.testing.assert_array_equal(data["labels"], expected)

    def test_channel_file_filtering(self, sample_npz, tmp_path):
        import json

        channel_file = tmp_path / "channels.json"
        channel_file.write_text(
            json.dumps({"tone_discriminative": [1, 3], "syllable_discriminative": [3, 5]})
        )
        handler = ClassificationSampleHandler(
            Namespace(
                sample_path=sample_npz,
                targets=["tone", "syllable"],
                features="ecog",
                channel_file=str(channel_file),
            )
        )
        data = handler.load_data()
        np.testing.assert_array_equal(data["selected_channels"], [1, 3, 5])
        assert data["features"].shape[1] == 3

    def test_class_labels_cartesian(self, sample_npz):
        handler = ClassificationSampleHandler(
            Namespace(
                sample_path=sample_npz,
                targets=["syllable", "tone"],
                features="ecog",
                class_labels={"syllable": ["mi", "ma"], "tone": None},
            )
        )
        labels = handler.prepare_class_labels({"syllable": 2, "tone": 4})
        assert labels[0] == "mi_1"
        assert len(labels) == 8


class TestTrainer:
    def test_scan_unroll_is_semantics_neutral(self, rng):
        """unroll > 1 on the inner batch/eval scans must reproduce the
        unroll=1 fit exactly (same shuffles, same update order)."""
        x, y = _separable_data(rng, n=96)

        def fit(unroll):
            model = LogisticRegressionClassifier(
                input_dim=4 * 20, n_classes=3
            )
            trainer = ClassifierTrainer(
                model, n_classes=3, learning_rate=5e-3, batch_size=16,
                max_epochs=5, patience=5, seed=0, scan_unroll=unroll,
            )
            return trainer.fit(x[:80], y[:80], x[80:], y[80:]).history

        h1, h4 = fit(1), fit(4)
        assert len(h1) == len(h4)
        for e1, e4 in zip(h1, h4):
            for key in e1:
                np.testing.assert_allclose(
                    e1[key], e4[key], rtol=1e-5, atol=1e-6
                )

    def test_logistic_converges(self, rng):
        x, y = _separable_data(rng)
        model = LogisticRegressionClassifier(input_dim=4 * 20, n_classes=3)
        trainer = ClassifierTrainer(
            model, n_classes=3, learning_rate=5e-3, batch_size=32,
            max_epochs=30, patience=10, seed=0,
        )
        result = trainer.fit(x[:150], y[:150], x[150:], y[150:])
        assert result.history[-1]["val/accuracy"] > 0.9
        preds = trainer.predict(x[150:])
        assert (preds == y[150:]).mean() > 0.9

    def test_bf16_moments_converge_and_are_stored_reduced(self, rng):
        """moment_dtype='bfloat16' keeps the NAdam moments in bf16 at
        rest (HBM-traffic/footprint feature for big models) while the
        fit trajectory stays within quality noise of f32 state."""
        import jax
        import jax.numpy as jnp

        x, y = _separable_data(rng)

        def fit(moment_dtype):
            model = LogisticRegressionClassifier(input_dim=4 * 20, n_classes=3)
            trainer = ClassifierTrainer(
                model, n_classes=3, learning_rate=5e-3, batch_size=32,
                max_epochs=30, patience=10, seed=0,
                moment_dtype=moment_dtype,
            )
            result = trainer.fit(x[:150], y[:150], x[150:], y[150:])
            return trainer, result

        trainer, result = fit("bfloat16")
        float_leaves = [
            leaf
            for leaf in jax.tree_util.tree_leaves(trainer.opt_state)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        ]
        assert float_leaves, "optimizer state has no floating leaves"
        assert all(leaf.dtype == jnp.bfloat16 for leaf in float_leaves)
        assert result.history[-1]["val/accuracy"] > 0.9
        preds = trainer.predict(x[150:])
        assert (preds == y[150:]).mean() > 0.9

    def test_early_stopping(self, rng):
        x, y = _separable_data(rng, n=80)
        model = LogisticRegressionClassifier(input_dim=4 * 20, n_classes=3)
        trainer = ClassifierTrainer(
            model, n_classes=3, learning_rate=1.0,  # divergent LR
            batch_size=16, max_epochs=50, patience=2, seed=0,
        )
        result = trainer.fit(x[:60], y[:60], x[60:], y[60:])
        assert len(result.history) < 50

    def test_history_logged(self, rng, tmp_path):
        x, y = _separable_data(rng, n=60)
        model = LogisticRegressionClassifier(input_dim=4 * 20, n_classes=3)
        trainer = ClassifierTrainer(
            model, n_classes=3, batch_size=16, max_epochs=2, seed=0,
            log_dir=str(tmp_path / "logs"),
        )
        trainer.fit(x[:40], y[:40], x[40:], y[40:])
        trainer.test(x[40:], y[40:])
        assert os.path.exists(tmp_path / "logs" / "metrics.csv")
        assert os.path.exists(tmp_path / "logs" / "confusion_matrix_test.csv")


class TestPerTargetModels:
    """classifier_pipeline.target_model_params: the model.per_target
    override that lets one run pair different architectures per target
    (the reference trains every target with its single model section)."""

    def _params(self, **kw):
        from argparse import Namespace

        base = dict(
            model="models.simple_classifiers.LogisticRegressionClassifier",
            model_name="logistic",
            model_kwargs={},
        )
        base.update(kw)
        return Namespace(**base)

    def test_no_overrides_returns_params_unchanged(self):
        from decode_tonal_langauge_tpu.training.classifier_pipeline import (
            target_model_params,
        )

        p = self._params()
        assert target_model_params(p, "tone") is p
        p2 = self._params(per_target={"syllable": {"model": "x.Y"}})
        assert target_model_params(p2, "tone") is p2  # other target only

    def test_override_model_derives_name_and_keeps_base_kwargs(self):
        from decode_tonal_langauge_tpu.training.classifier_pipeline import (
            target_model_params,
        )

        p = self._params(
            model_kwargs={"a": 1},
            per_target={
                "tone": {"model": "models.simple_classifiers.ShallowNNClassifier"}
            },
        )
        tp = target_model_params(p, "tone")
        assert tp is not p
        assert tp.model.endswith("ShallowNNClassifier")
        assert tp.model_name == "ShallowNNClassifier"  # derived from class
        assert tp.model_kwargs == {"a": 1}  # base kwargs kept
        # base params untouched
        assert p.model_name == "logistic"

    def test_kwargs_only_override_keeps_base_name(self):
        from decode_tonal_langauge_tpu.training.classifier_pipeline import (
            target_model_params,
        )

        p = self._params(per_target={"tone": {"model_kwargs": {"dtype": "bfloat16"}}})
        tp = target_model_params(p, "tone")
        assert tp.model == p.model
        assert tp.model_name == "logistic"  # unchanged: same architecture
        assert tp.model_kwargs == {"dtype": "bfloat16"}

    def test_explicit_model_name_wins(self):
        from decode_tonal_langauge_tpu.training.classifier_pipeline import (
            target_model_params,
        )

        p = self._params(
            per_target={"tone": {"model": "x.Y", "model_name": "custom"}}
        )
        assert target_model_params(p, "tone").model_name == "custom"

    def test_joint_mode_warns_and_ignores(self):
        import warnings

        import numpy as np

        from decode_tonal_langauge_tpu.training.classifier_pipeline import (
            train_joint_targets,
        )

        p = self._params(
            targets=["tone"],
            per_target={"tone": {"model": "x.Y"}},
            sample_path="/nonexistent.npz",
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            try:
                train_joint_targets(p, np.asarray([1]))
            except Exception:
                pass  # fails later on the bogus sample_path — fine
        assert any("per_target is ignored" in str(w.message) for w in caught)
