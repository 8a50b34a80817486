"""Synthesis-path tests: MCD, trainer convergence, and the CLI end-to-end
on a small synthetic sample set."""

import json
import os

import numpy as np
import pytest

from decode_tonal_langauge_tpu.models.simple import LogisticRegressionClassifier
from decode_tonal_langauge_tpu.models.synthesis import SynthesisLite
from decode_tonal_langauge_tpu.training import train_synthesizer
from decode_tonal_langauge_tpu.training.synthesis_trainer import (
    SynthesisTrainer,
    compute_mcd,
)

TONE_MAPPING = {"0": [5, 5, 5], "1": [3, 4, 5], "2": [3, 2, 3], "3": [5, 3, 1]}


def test_compute_mcd_formula():
    true = np.zeros((2, 4))
    pred = np.ones((2, 4))
    expected = 10 / np.log(10) * np.sqrt(2 * 4.0)
    assert compute_mcd(true, pred) == pytest.approx(expected, rel=1e-5)


def _toy_synthesis_data(rng, n=48, c_non=5, c_cls=3, t=64, out_dim=32):
    tones = rng.integers(0, 4, n)
    sylls = rng.integers(0, 2, n)
    ecog_non = rng.standard_normal((n, c_non, t)).astype(np.float32)
    ecog_syll = rng.standard_normal((n, c_cls, t)).astype(np.float32)
    ecog_tone = rng.standard_normal((n, c_cls, t)).astype(np.float32)
    # classifier channels encode the label
    ecog_tone += tones[:, None, None] * 1.0
    ecog_syll += sylls[:, None, None] * 2.0
    # mel target depends on ECoG mean + tone
    base = ecog_non.mean(axis=(1, 2), keepdims=False)
    mels = (
        base[:, None] + tones[:, None] * 0.5 + rng.standard_normal((n, out_dim)) * 0.05
    ).astype(np.float32)
    return ecog_non, ecog_syll, ecog_tone, mels, tones, sylls


class TestSynthesisTrainer:
    def test_loss_decreases(self, rng):
        ecog_non, ecog_syll, ecog_tone, mels, _, _ = _toy_synthesis_data(rng)
        c_cls, t = ecog_syll.shape[1], ecog_syll.shape[2]

        import jax

        tone_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=4)
        syll_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=2)
        tone_vars = tone_model.init(
            {"params": jax.random.key(0)}, ecog_tone[:1], train=False
        )
        syll_vars = syll_model.init(
            {"params": jax.random.key(1)}, ecog_syll[:1], train=False
        )

        model = SynthesisLite(
            output_dim=mels.shape[1], n_channels=ecog_non.shape[1], n_timepoints=t
        )
        trainer = SynthesisTrainer(
            model, tone_model, tone_vars, syll_model, syll_vars,
            TONE_MAPPING, learning_rate=2e-3, seed=0, verbose=False,
        )
        data = (ecog_non, ecog_syll, ecog_tone, mels)
        history = trainer.train(data, epochs=12, batch_size=8, verbose=False)
        assert history[-1][0] < history[0][0]  # L1 loss decreases

        mcd, recon, origin = trainer.evaluate(data, batch_size=8)
        assert recon.shape == mels.shape
        assert origin.shape == mels.shape
        assert np.isfinite(mcd)

    def test_bf16_moments(self, rng):
        """moment_dtype='bfloat16' stores the NAdam state reduced (the
        102 M-param paper model's optimizer is an HBM floor — PROFILE.md)
        and still trains: loss decreases as in the f32-state run."""
        import jax
        import jax.numpy as jnp

        ecog_non, ecog_syll, ecog_tone, mels, _, _ = _toy_synthesis_data(rng)
        c_cls, t = ecog_syll.shape[1], ecog_syll.shape[2]
        tone_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=4)
        syll_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=2)
        tone_vars = tone_model.init(
            {"params": jax.random.key(0)}, ecog_tone[:1], train=False
        )
        syll_vars = syll_model.init(
            {"params": jax.random.key(1)}, ecog_syll[:1], train=False
        )
        model = SynthesisLite(
            output_dim=mels.shape[1], n_channels=ecog_non.shape[1],
            n_timepoints=t,
        )
        trainer = SynthesisTrainer(
            model, tone_model, tone_vars, syll_model, syll_vars,
            TONE_MAPPING, learning_rate=2e-3, seed=0, verbose=False,
            moment_dtype="bfloat16",
        )
        data = (ecog_non, ecog_syll, ecog_tone, mels)
        history = trainer.train(data, epochs=12, batch_size=8, verbose=False)
        assert history[-1][0] < history[0][0]
        float_leaves = [
            leaf
            for leaf in jax.tree_util.tree_leaves(trainer.opt_state)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        ]
        assert float_leaves
        assert all(leaf.dtype == jnp.bfloat16 for leaf in float_leaves)

    def test_mesh_parity(self, rng):
        """Meshed (DP over 8 virtual devices) and single-device training
        must produce the same loss curve."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from decode_tonal_langauge_tpu.parallel.mesh import make_mesh

        ecog_non, ecog_syll, ecog_tone, mels, _, _ = _toy_synthesis_data(rng)
        c_cls, t = ecog_syll.shape[1], ecog_syll.shape[2]
        tone_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=4)
        syll_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=2)
        tone_vars = tone_model.init(
            {"params": jax.random.key(0)}, ecog_tone[:1], train=False
        )
        syll_vars = syll_model.init(
            {"params": jax.random.key(1)}, ecog_syll[:1], train=False
        )
        data = (ecog_non, ecog_syll, ecog_tone, mels)

        def run(mesh):
            model = SynthesisLite(
                output_dim=mels.shape[1], n_channels=ecog_non.shape[1],
                n_timepoints=t,
            )
            trainer = SynthesisTrainer(
                model, tone_model, tone_vars, syll_model, syll_vars,
                TONE_MAPPING, learning_rate=2e-3, seed=0, verbose=False,
                mesh=mesh,
            )
            return trainer.train(data, epochs=3, batch_size=8, verbose=False)

        h1 = run(None)
        h2 = run(make_mesh(8, axis_names=("data",)))
        for (l1, m1), (l2, m2) in zip(h1, h2):
            assert l1 == pytest.approx(l2, rel=1e-4)
            assert m1 == pytest.approx(m2, rel=1e-4)


class TestSynthesizerCLI:
    def test_end_to_end(self, rng, tmp_path):
        n, c, t = 32, 10, 64
        sr = 2000
        audio_len = 2048
        ecog = rng.standard_normal((n, c, t)).astype(np.float32)
        audio = rng.standard_normal((n, audio_len)).astype(np.float32)
        tone = rng.integers(0, 4, n)
        syllable = rng.integers(0, 2, n)

        sample_path = tmp_path / "subject_1.npz"
        np.savez(
            sample_path, ecog=ecog, ecog_sf=200.0, audio=audio, audio_sf=sr,
            tone=tone, syllable=syllable,
        )

        channel_file = tmp_path / "channels.json"
        channel_file.write_text(
            json.dumps(
                {
                    "active_channels": list(range(10)),
                    "tone_discriminative": [0, 1],
                    "syllable_discriminative": [2, 3],
                }
            )
        )

        config_file = tmp_path / "config.json"
        config_file.write_text(
            json.dumps(
                {
                    "mel_kwargs": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
                    "tone_dynamic_mapping": TONE_MAPPING,
                    "n_syllables": 2,
                    "n_tones": 4,
                }
            )
        )

        parser = train_synthesizer.build_parser()
        params = parser.parse_args(
            [
                "--sample_path", str(sample_path),
                "--subject_id", "1",
                "--result_file", str(tmp_path / "results.csv"),
                "--figure_dir", str(tmp_path / "figs"),
                "--audio_dir", str(tmp_path / "wavs"),
                "--channel_file", str(channel_file),
                "--config_file", str(config_file),
                "--model_name", "lite_test",
                "--synthesis_model_name", "SynthesisLite",
                "--syllable_model_name", "logistic",
                "--tone_model_name", "logistic",
                "--epochs", "2",
                "--batch_size", "8",
                "--verbose", "0",
                "--audio_sampling_rate", str(sr),
            ]
        )
        summary = train_synthesizer.run(params)

        assert os.path.exists(tmp_path / "results.csv")
        assert np.isfinite(summary["mcd_mean"])
        assert os.path.exists(tmp_path / "figs" / "training_losses.png")
        assert os.path.exists(tmp_path / "figs" / "mel_compare_0.png")
        assert os.path.exists(tmp_path / "wavs" / "recon_0.wav")

        # append mode: second run adds a row
        train_synthesizer.run(params)
        import pandas as pd

        df = pd.read_csv(tmp_path / "results.csv")
        assert len(df) == 2

    def test_evaluate_only_reproduces_fit_metrics(self, rng, tmp_path):
        """--evaluate_only reloads the --checkpoint_dir synthesizers,
        reproduces each seed's test split from the same seed stream, and
        must recompute the fit's MCD / mel Pearson r EXACTLY (frozen
        predictions and the eval pass are deterministic) — the synthesis
        counterpart of the pipeline's evaluation stage."""
        import pandas as pd

        n, c, t = 32, 10, 64
        sr = 2000
        sample_path = tmp_path / "subject_1.npz"
        np.savez(
            sample_path,
            ecog=rng.standard_normal((n, c, t)).astype(np.float32),
            ecog_sf=200.0,
            audio=rng.standard_normal((n, 2048)).astype(np.float32),
            audio_sf=sr,
            tone=rng.integers(0, 4, n),
            syllable=rng.integers(0, 2, n),
        )
        channel_file = tmp_path / "channels.json"
        channel_file.write_text(json.dumps({
            "active_channels": list(range(10)),
            "tone_discriminative": [0, 1],
            "syllable_discriminative": [2, 3],
        }))
        config_file = tmp_path / "config.json"
        config_file.write_text(json.dumps({
            "mel_kwargs": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
            "tone_dynamic_mapping": TONE_MAPPING,
            "n_syllables": 2,
            "n_tones": 4,
        }))

        common = [
            "--sample_path", str(sample_path),
            "--subject_id", "1",
            "--channel_file", str(channel_file),
            "--config_file", str(config_file),
            "--model_name", "lite_test",
            "--synthesis_model_name", "SynthesisLite",
            "--syllable_model_name", "logistic",
            "--tone_model_name", "logistic",
            "--epochs", "2",
            "--batch_size", "8",
            "--repeat", "2",
            "--seed_parallel", "0",
            "--verbose", "0",
            "--audio_sampling_rate", str(sr),
            "--checkpoint_dir", str(tmp_path / "ckpts"),
        ]
        parser = train_synthesizer.build_parser()
        fit = train_synthesizer.run(parser.parse_args(
            common + ["--result_file", str(tmp_path / "fit.csv")]
        ))
        ev = train_synthesizer.run(parser.parse_args(
            common + [
                "--result_file", str(tmp_path / "eval.csv"),
                "--evaluate_only",
            ]
        ))
        assert ev["mcd_all"] == fit["mcd_all"]
        assert ev["mel_pearson_r_mean"] == fit["mel_pearson_r_mean"]
        assert ev["model_size"] == fit["model_size"]
        # Same results-CSV schema either way.
        assert list(pd.read_csv(tmp_path / "eval.csv").columns) == list(
            pd.read_csv(tmp_path / "fit.csv").columns
        )

    def test_evaluate_only_requires_checkpoints(self, tmp_path):
        parser = train_synthesizer.build_parser()
        params = parser.parse_args([
            "--sample_path", str(tmp_path / "missing.npz"),
            "--subject_id", "1",
            "--result_file", str(tmp_path / "r.csv"),
            "--model_name", "m",
            "--synthesis_model_name", "SynthesisLite",
            "--syllable_model_name", "logistic",
            "--tone_model_name", "logistic",
            "--evaluate_only",
        ])
        with pytest.raises((ValueError, FileNotFoundError)):
            train_synthesizer.run(params)

    def test_unknown_models_rejected(self):
        with pytest.raises(ValueError):
            train_synthesizer.build_classifier("nope", 2, 3, 10)
        with pytest.raises(ValueError):
            train_synthesizer.build_synthesis_model("nope", 2, 3, 10)


class TestSeedParallelSynthesis:
    def test_vmapped_seeds_match_sequential(self, rng):
        """seed_parallel_fit_eval must reproduce the sequential per-seed
        train+evaluate pair (histories and test MCD)."""
        import jax

        from decode_tonal_langauge_tpu.data.splits import split_indices
        from decode_tonal_langauge_tpu.training.synthesis_trainer import (
            seed_parallel_fit_eval,
        )

        ecog_non, ecog_syll, ecog_tone, mels, _, _ = _toy_synthesis_data(rng)
        c_cls, t = ecog_syll.shape[1], ecog_syll.shape[2]
        tone_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=4)
        syll_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=2)
        tone_vars = tone_model.init(
            {"params": jax.random.key(0)}, ecog_tone[:1], train=False
        )
        syll_vars = syll_model.init(
            {"params": jax.random.key(1)}, ecog_syll[:1], train=False
        )
        arrays = (ecog_non, ecog_syll, ecog_tone, mels)
        seeds = [5, 11]
        splits = [
            split_indices(ecog_non.shape[0], [0.8, 0.2], seed=s) for s in seeds
        ]

        def make_trainer(seed):
            model = SynthesisLite(
                output_dim=mels.shape[1], n_channels=ecog_non.shape[1],
                n_timepoints=t,
            )
            return SynthesisTrainer(
                model, tone_model, tone_vars, syll_model, syll_vars,
                TONE_MAPPING, learning_rate=2e-3, seed=seed, verbose=False,
            )

        # sequential reference
        seq = []
        for seed, (tr, te) in zip(seeds, splits):
            trainer = make_trainer(seed)
            hist = trainer.train(
                tuple(a[tr] for a in arrays), epochs=3, batch_size=8,
                verbose=False,
            )
            mcd, recon, origin = trainer.evaluate(
                tuple(a[te] for a in arrays), batch_size=8
            )
            seq.append((hist, mcd, recon))

        # vmapped
        proto = make_trainer(seeds[0])
        par = seed_parallel_fit_eval(
            proto, seeds,
            tuple(np.stack([a[s[0]] for s in splits]) for a in arrays),
            tuple(np.stack([a[s[-1]] for s in splits]) for a in arrays),
            epochs=3, batch_size=8,
        )

        for (h_s, mcd_s, recon_s), (h_p, mcd_p, recon_p, _) in zip(seq, par):
            assert mcd_p == pytest.approx(mcd_s, rel=2e-3)
            for (l_s, m_s), (l_p, m_p) in zip(h_s, h_p):
                assert l_p == pytest.approx(l_s, rel=2e-3, abs=1e-4)
                assert m_p == pytest.approx(m_s, rel=2e-3)
            np.testing.assert_allclose(recon_p, recon_s, rtol=5e-2, atol=5e-3)


def test_per_seed_trainers_share_jit_identity(rng):
    """make_trainer(seed) per repeat seed rebuilds the dynamics table;
    trainers must still compare equal (content-keyed) so the jitted fit
    compiles once across seeds."""
    from decode_tonal_langauge_tpu.models.synthesis import SynthesisLite
    from decode_tonal_langauge_tpu.training.synthesis_trainer import (
        SynthesisTrainer,
    )

    tone_vars, syll_vars = {"params": {}}, {"params": {}}

    def make(seed):
        return SynthesisTrainer(
            SynthesisLite(output_dim=8, n_channels=2, n_timepoints=16),
            None, tone_vars, None, syll_vars,
            dict(TONE_MAPPING), seed=seed, verbose=False,
        )

    a, b = make(0), make(1)
    assert a == b and hash(a) == hash(b)


def test_target_mean_init_parity_and_benefit(rng):
    """Output-bias = train-mel-mean init: the vmapped multi-seed path
    must match the sequential path with the same init, and the first
    training epochs must start from a far lower loss than zero-bias
    init (the measured MCD 2463->503 effect at production shapes)."""
    import jax

    from decode_tonal_langauge_tpu.data.splits import split_indices
    from decode_tonal_langauge_tpu.models.simple import (
        LogisticRegressionClassifier,
    )
    from decode_tonal_langauge_tpu.training.synthesis_trainer import (
        SynthesisTrainer,
        seed_parallel_fit_eval,
    )

    ecog_non, ecog_syll, ecog_tone, mels, _, _ = _toy_synthesis_data(rng)
    mels = mels - 30.0  # dB-scale offset: makes the bias matter
    c_cls, t = ecog_syll.shape[1], ecog_syll.shape[2]
    tone_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=4)
    syll_model = LogisticRegressionClassifier(input_dim=c_cls * t, n_classes=2)
    tone_vars = tone_model.init(
        {"params": jax.random.key(0)}, ecog_tone[:1], train=False
    )
    syll_vars = syll_model.init(
        {"params": jax.random.key(1)}, ecog_syll[:1], train=False
    )
    arrays = (ecog_non, ecog_syll, ecog_tone, mels)
    seeds = [5, 11]
    splits = [
        split_indices(ecog_non.shape[0], [0.8, 0.2], seed=s) for s in seeds
    ]

    def make_trainer(seed):
        model = SynthesisLite(
            output_dim=mels.shape[1], n_channels=ecog_non.shape[1],
            n_timepoints=t,
        )
        return SynthesisTrainer(
            model, tone_model, tone_vars, syll_model, syll_vars,
            TONE_MAPPING, learning_rate=2e-3, seed=seed, verbose=False,
        )

    target_means = np.stack([mels[s[0]].mean(axis=0) for s in splits])

    # sequential with target-mean init
    seq = []
    for (seed, (tr, te)), tm in zip(zip(seeds, splits), target_means):
        trainer = make_trainer(seed)
        hist = trainer.train(
            tuple(a[tr] for a in arrays), epochs=3, batch_size=8,
            verbose=False, target_mean=tm,
        )
        mcd, _, _ = trainer.evaluate(
            tuple(a[te] for a in arrays), batch_size=8
        )
        seq.append((hist, mcd))

    # zero-bias sequential baseline (for the benefit assertion)
    base_trainer = make_trainer(seeds[0])
    base_hist = base_trainer.train(
        tuple(a[splits[0][0]] for a in arrays), epochs=3, batch_size=8,
        verbose=False,
    )
    assert seq[0][0][0][0] < 0.5 * base_hist[0][0], (
        "target-mean init should start far below the zero-bias loss"
    )

    # vmapped path with the same init
    proto = make_trainer(seeds[0])
    train_stacks = tuple(
        np.stack([a[s[0]] for s in splits]) for a in arrays
    )
    test_stacks = tuple(
        np.stack([a[s[-1]] for s in splits]) for a in arrays
    )
    par = seed_parallel_fit_eval(
        proto, seeds, train_stacks, test_stacks, epochs=3, batch_size=8,
        target_means=target_means,
    )
    for (hist_s, mcd_s), (hist_p, mcd_p, _, _) in zip(seq, par):
        assert mcd_p == pytest.approx(mcd_s, rel=2e-3)
        for (l_s, m_s), (l_p, m_p) in zip(hist_s, hist_p):
            assert l_p == pytest.approx(l_s, rel=2e-3, abs=1e-4)
