"""Full train-state checkpoint + resume (SURVEY §5, VERDICT r3 item 3).

A fit checkpointed mid-run and resumed must continue the EXACT trajectory
of an uninterrupted fit: params, NAdam moments, the RNG stream (epoch
shuffles + dropout), early-stopping bookkeeping, and the metric history
all round-trip through Orbax. The reference saves only
``model.state_dict()`` (``/root/reference/training/
classifier_pipeline.py:161-168``) — its resumed optimizer moments restart
from zero, which these tests would catch as a diverged history.
"""

import numpy as np
import pytest

from decode_tonal_langauge_tpu.models.simple import (
    LogisticRegressionClassifier,
    ShallowNNClassifier,
)
from decode_tonal_langauge_tpu.training.trainer import ClassifierTrainer


def _separable_data(rng, n=96, c=4, t=16, n_classes=3):
    y = rng.integers(0, n_classes, n).astype(np.int32)
    x = rng.standard_normal((n, c, t)).astype(np.float32)
    for k in range(n_classes):
        x[y == k, k % c, :] += 2.0
    return x, y


def _make_trainer(model, n_classes, max_epochs, **kw):
    return ClassifierTrainer(
        model,
        n_classes=n_classes,
        learning_rate=2e-3,
        batch_size=16,
        max_epochs=max_epochs,
        patience=100,  # keep every epoch executing unless a test wants ES
        seed=0,
        **kw,
    )


def _histories_close(h1, h2, rel=1e-4):
    assert len(h1) == len(h2), (len(h1), len(h2))
    for r1, r2 in zip(h1, h2):
        for key in r1:
            if key == "epoch":
                assert r1[key] == r2[key]
            else:
                assert r1[key] == pytest.approx(r2[key], rel=rel, abs=1e-5), key


class TestClassifierResume:
    def test_resume_matches_uninterrupted(self, rng, tmp_path):
        x, y = _separable_data(rng)
        tr, va = slice(0, 64), slice(64, 96)
        model = LogisticRegressionClassifier(input_dim=4 * 16, n_classes=3)

        # uninterrupted 10-epoch fit
        full = _make_trainer(model, 3, 10)
        res_full = full.fit(x[tr], y[tr], x[va], y[va])

        # 5 epochs, checkpoint, then resume for 5 more in a NEW trainer
        ckpt = str(tmp_path / "state")
        first = _make_trainer(model, 3, 5)
        first.fit(x[tr], y[tr], x[va], y[va], checkpoint_dir=ckpt)

        second = _make_trainer(model, 3, 10)
        res_resumed = second.fit(
            x[tr], y[tr], x[va], y[va], checkpoint_dir=ckpt, resume=True
        )

        _histories_close(res_full.history, res_resumed.history)
        import jax

        for a, b in zip(
            jax.tree_util.tree_leaves(full.params),
            jax.tree_util.tree_leaves(second.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_checkpoint_every_segments_match_plain_fit(self, rng, tmp_path):
        x, y = _separable_data(rng)
        tr, va = slice(0, 64), slice(64, 96)
        model = LogisticRegressionClassifier(input_dim=4 * 16, n_classes=3)

        plain = _make_trainer(model, 3, 9)
        res_plain = plain.fit(x[tr], y[tr], x[va], y[va])

        segmented = _make_trainer(model, 3, 9)
        res_seg = segmented.fit(
            x[tr], y[tr], x[va], y[va],
            checkpoint_dir=str(tmp_path / "seg"), checkpoint_every=3,
        )
        _histories_close(res_plain.history, res_seg.history)

    def test_optimizer_moments_actually_resume(self, rng, tmp_path):
        """A params-only restore (the reference's snapshot) restarts the
        NAdam moments and produces a DIFFERENT trajectory — guard that
        the full-state path does not degrade to that."""
        x, y = _separable_data(rng)
        tr, va = slice(0, 64), slice(64, 96)
        model = ShallowNNClassifier(
            input_dim=4 * 16, n_classes=3, hidden_dim=16
        )

        ckpt = str(tmp_path / "state")
        first = _make_trainer(model, 3, 5)
        first.fit(x[tr], y[tr], x[va], y[va], checkpoint_dir=ckpt)

        # full resume
        full = _make_trainer(model, 3, 10)
        res_full = full.fit(
            x[tr], y[tr], x[va], y[va], checkpoint_dir=ckpt, resume=True
        )

        # params-only restart (fresh opt state + rng): same params, no state
        broken = _make_trainer(model, 3, 5)
        broken.init(x[tr])
        broken.params = first.params
        res_broken = broken.fit(x[tr], y[tr], x[va], y[va])

        full_tail = [r["train/loss"] for r in res_full.history[5:]]
        broken_tail = [r["train/loss"] for r in res_broken.history]
        # trajectories must differ (if they match, the moments/rng were
        # not actually part of the resumed state)
        assert not np.allclose(full_tail, broken_tail, rtol=1e-6)

    def test_bf16_moments_resume_exactly(self, rng, tmp_path):
        """moment_dtype='bfloat16' state round-trips through Orbax
        bit-exactly: the resumed fit continues the uninterrupted bf16
        trajectory (the reduced dtype must survive save/restore, not be
        silently widened to a diverging f32 state)."""
        import jax
        import jax.numpy as jnp

        x, y = _separable_data(rng)
        tr, va = slice(0, 64), slice(64, 96)
        model = LogisticRegressionClassifier(input_dim=4 * 16, n_classes=3)

        full = _make_trainer(model, 3, 10, moment_dtype="bfloat16")
        res_full = full.fit(x[tr], y[tr], x[va], y[va])

        ckpt = str(tmp_path / "bf16_state")
        first = _make_trainer(model, 3, 5, moment_dtype="bfloat16")
        first.fit(x[tr], y[tr], x[va], y[va], checkpoint_dir=ckpt)

        second = _make_trainer(model, 3, 10, moment_dtype="bfloat16")
        res_resumed = second.fit(
            x[tr], y[tr], x[va], y[va], checkpoint_dir=ckpt, resume=True
        )

        _histories_close(res_full.history, res_resumed.history)
        restored_float = [
            leaf
            for leaf in jax.tree_util.tree_leaves(second.opt_state)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        ]
        assert all(leaf.dtype == jnp.bfloat16 for leaf in restored_float)

    def test_early_stop_state_rides_checkpoint(self, rng, tmp_path):
        x, y = _separable_data(rng)
        tr, va = slice(0, 64), slice(64, 96)
        model = LogisticRegressionClassifier(input_dim=4 * 16, n_classes=3)

        def trainer(max_epochs):
            return ClassifierTrainer(
                model, n_classes=3, learning_rate=2e-3, batch_size=16,
                max_epochs=max_epochs, patience=1, seed=0,
            )

        full = trainer(14)
        res_full = full.fit(x[tr], y[tr], x[va], y[va])

        ckpt = str(tmp_path / "es_state")
        first = trainer(7)
        first.fit(x[tr], y[tr], x[va], y[va], checkpoint_dir=ckpt)
        second = trainer(14)
        res_resumed = second.fit(
            x[tr], y[tr], x[va], y[va], checkpoint_dir=ckpt, resume=True
        )

        assert res_resumed.best_epoch == res_full.best_epoch
        assert res_resumed.stopped_early == res_full.stopped_early
        _histories_close(res_full.history, res_resumed.history)


class TestPipelineResumeWiring:
    def test_classifier_stage_resume_keys(self, rng, tmp_path):
        """training.params.training keys train_state_dir/resume/
        checkpoint_every reach ClassifierTrainer.fit through the
        (sequential) pipeline path and produce a resumable state."""
        from argparse import Namespace

        from decode_tonal_langauge_tpu.training.classifier_pipeline import (
            _fit_eval_all_seeds,
        )

        x, y = _separable_data(rng, n=80)
        ts_dir = str(tmp_path / "train_state")

        def params(epochs, resume):
            return Namespace(
                model="models.simple_classifiers.LogisticRegressionClassifier",
                model_name="logistic",
                model_kwargs={},
                lr=2e-3, weight_decay=0.0, batch_size=16,
                epochs=epochs, patience=100,
                train_ratio=0.7, vali_ratio=0.1, test_ratio=0.2,
                train_state_dir=ts_dir, resume=resume,
                checkpoint_every=None, seed_parallel=True,
                targets=["tone"], verbose=0,
            )

        res_a = _fit_eval_all_seeds(
            params(4, False), x, y, 3, [7], lambda s: None
        )
        res_b = _fit_eval_all_seeds(
            params(8, True), x, y, 3, [7], lambda s: None
        )
        res_full = _fit_eval_all_seeds(
            Namespace(
                **{**vars(params(8, False)), "train_state_dir": None}
            ),
            x, y, 3, [7], lambda s: None,
        )
        np.testing.assert_allclose(
            np.concatenate(
                [np.ravel(l) for l in jax_leaves(res_b[0].params)]
            ),
            np.concatenate(
                [np.ravel(l) for l in jax_leaves(res_full[0].params)]
            ),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_array_equal(
            res_b[0].test_preds, res_full[0].test_preds
        )

    def test_separate_targets_get_separate_train_states(self, rng, tmp_path):
        """separate_models + train_state_dir: each target's fit must
        checkpoint under its OWN (subject, target)-keyed path. The
        regression here was a shared '_'.join(targets) path — the
        syllable and tone fits (different n_classes, different head
        shapes) overwrote each other's state, and a resumed run restored
        the wrong target's params into the wrong model."""
        import os

        from decode_tonal_langauge_tpu.training import train_classifier

        n = 64
        x = np.asarray(rng.standard_normal((n, 6, 10)), dtype=np.float32)
        syll = np.tile([0, 1], n // 2)
        tone = np.tile([0, 1, 2, 3], n // 4)
        x[syll == 1, :3] += 4.0
        x[tone == 2, 3:] += 3.0
        sample_dir = tmp_path / "samples"
        sample_dir.mkdir()
        np.savez(
            sample_dir / "subject_1.npz",
            ecog=x, ecog_sf=100.0, syllable=syll, tone=tone,
        )
        ts_dir = str(tmp_path / "train_state")

        def config(epochs, resume):
            return {
                "model": {
                    "model": (
                        "models.simple_classifiers."
                        "LogisticRegressionClassifier"
                    ),
                    "model_name": "logistic",
                    "model_kwargs": {},
                },
                "training": {
                    "module": "train_classifier",
                    "params": {
                        "io": {
                            "log_dir": str(tmp_path / f"logs_{epochs}"),
                            "sample_dir": str(sample_dir),
                        },
                        "experiment": {
                            "targets": ["syllable", "tone"],
                            "features": "ecog",
                            "separate_models": True,
                            "seed": 42, "repeat": 1, "verbose": 0,
                        },
                        "training": {
                            "train_ratio": 0.6, "vali_ratio": 0.2,
                            "test_ratio": 0.2, "batch_size": 8,
                            "epochs": epochs, "lr": 0.01, "patience": 100,
                            "train_state_dir": ts_dir, "resume": resume,
                        },
                    },
                },
                "evaluation": {"metrics": ["accuracy"]},
            }

        train_classifier.run(config(3, False))
        state_dirs = sorted(os.listdir(ts_dir))
        # One state per (target, seed) — NOT one shared syllable_tone path
        assert len(state_dirs) == 2
        assert any(d.startswith("syllable_") for d in state_dirs)
        assert any(d.startswith("tone_") for d in state_dirs)
        assert all("subject_1" in d for d in state_dirs)

        # Resuming trains on: the tone fit restores TONE state (4-class
        # head), not the syllable fit's 2-class params.
        out = train_classifier.run(config(6, True))
        assert os.path.exists(os.path.join(out, "results.csv"))

    def test_synthesizer_cli_resume(self, rng, tmp_path):
        import json

        from decode_tonal_langauge_tpu.training import train_synthesizer

        n, c, t = 24, 8, 48
        sr = 2000
        ecog = rng.standard_normal((n, c, t)).astype(np.float32)
        audio = rng.standard_normal((n, 1024)).astype(np.float32)
        sample_path = tmp_path / "subject_1.npz"
        np.savez(
            sample_path, ecog=ecog, ecog_sf=200.0, audio=audio, audio_sf=sr,
            tone=rng.integers(0, 4, n), syllable=rng.integers(0, 2, n),
        )
        channel_file = tmp_path / "channels.json"
        channel_file.write_text(json.dumps({
            "active_channels": list(range(8)),
            "tone_discriminative": [0, 1],
            "syllable_discriminative": [2, 3],
        }))
        config_file = tmp_path / "config.json"
        config_file.write_text(json.dumps({
            "mel_kwargs": {"n_fft": 128, "hop_length": 64, "n_mels": 12},
            "tone_dynamic_mapping": {
                "0": [5, 5, 5], "1": [3, 4, 5], "2": [3, 2, 3],
                "3": [5, 3, 1],
            },
            "n_syllables": 2, "n_tones": 4,
        }))

        def cli(epochs, resume, result_name):
            args = [
                "--sample_path", str(sample_path),
                "--subject_id", "1",
                "--result_file", str(tmp_path / result_name),
                "--channel_file", str(channel_file),
                "--config_file", str(config_file),
                "--model_name", "resume_test",
                "--synthesis_model_name", "SynthesisLite",
                "--syllable_model_name", "logistic",
                "--tone_model_name", "logistic",
                "--epochs", str(epochs),
                "--batch_size", "8",
                "--verbose", "0",
                "--audio_sampling_rate", str(sr),
                "--train_state_dir", str(tmp_path / "ts"),
            ] + (["--resume"] if resume else [])
            return train_synthesizer.run(
                train_synthesizer.build_parser().parse_args(args)
            )

        cli(2, False, "r1.csv")
        summary = cli(4, True, "r2.csv")
        assert np.isfinite(summary["mcd_mean"])
        import os as _os

        # per-seed state dirs exist (seeds are drawn from the base seed)
        state_dirs = _os.listdir(str(tmp_path / "ts"))
        assert len(state_dirs) == 1
        assert state_dirs[0].startswith("SynthesisLite_seed_")


def jax_leaves(tree):
    import jax

    return [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(tree)]


class TestSynthesisResume:
    def test_resume_matches_uninterrupted(self, rng, tmp_path):
        import jax

        from decode_tonal_langauge_tpu.models.synthesis import SynthesisLite
        from decode_tonal_langauge_tpu.training.synthesis_trainer import (
            SynthesisTrainer,
        )

        mapping = {"0": [5, 5, 5], "1": [3, 4, 5], "2": [3, 2, 3],
                   "3": [5, 3, 1]}
        n, c_non, c_cls, t, out_dim = 48, 5, 3, 32, 16
        ecog_non = rng.standard_normal((n, c_non, t)).astype(np.float32)
        ecog_syll = rng.standard_normal((n, c_cls, t)).astype(np.float32)
        ecog_tone = rng.standard_normal((n, c_cls, t)).astype(np.float32)
        mels = rng.standard_normal((n, out_dim)).astype(np.float32)
        data = (ecog_non, ecog_syll, ecog_tone, mels)

        tone_model = LogisticRegressionClassifier(
            input_dim=c_cls * t, n_classes=4
        )
        syll_model = LogisticRegressionClassifier(
            input_dim=c_cls * t, n_classes=2
        )
        tone_vars = tone_model.init(
            {"params": jax.random.key(0)}, ecog_tone[:1], train=False
        )
        syll_vars = syll_model.init(
            {"params": jax.random.key(1)}, ecog_syll[:1], train=False
        )

        def make():
            model = SynthesisLite(
                output_dim=out_dim, n_channels=c_non, n_timepoints=t
            )
            return SynthesisTrainer(
                model, tone_model, tone_vars, syll_model, syll_vars,
                mapping, learning_rate=2e-3, seed=0, verbose=False,
            )

        full_hist = make().train(data, epochs=10, batch_size=8, verbose=False)

        ckpt = str(tmp_path / "synth_state")
        make().train(
            data, epochs=5, batch_size=8, verbose=False, checkpoint_dir=ckpt
        )
        resumed_hist = make().train(
            data, epochs=10, batch_size=8, verbose=False,
            checkpoint_dir=ckpt, resume=True,
        )

        assert len(resumed_hist) == len(full_hist) == 10
        for (l1, m1), (l2, m2) in zip(full_hist, resumed_hist):
            assert l2 == pytest.approx(l1, rel=1e-4, abs=1e-6)
            assert m2 == pytest.approx(m1, rel=1e-4)
